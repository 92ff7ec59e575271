// Minimal std-based stand-in for the Boost.Hash APIs the reference planner
// uses (hash_combine / hash_range), so the unmodified reference C++ planner
// can be built in this image (no Boost installed) for baseline racing.
// Uses the same golden-ratio mixing constant as Boost's classic
// hash_combine, so behavior is equivalent in distribution (exact values
// need not match Boost: hashes are internal to one process run).
#ifndef PW_SHIM_BOOST_FUNCTIONAL_HASH_HPP_
#define PW_SHIM_BOOST_FUNCTIONAL_HASH_HPP_

#include <cstddef>
#include <functional>

namespace boost {

template <typename T>
inline void hash_combine(std::size_t& seed, const T& v) {
  seed ^= std::hash<T>{}(v) + 0x9e3779b9 + (seed << 6) + (seed >> 2);
}

template <typename It>
inline std::size_t hash_range(It first, It last) {
  std::size_t seed = 0;
  for (; first != last; ++first) {
    hash_combine(seed, *first);
  }
  return seed;
}

}  // namespace boost

#endif  // PW_SHIM_BOOST_FUNCTIONAL_HASH_HPP_
