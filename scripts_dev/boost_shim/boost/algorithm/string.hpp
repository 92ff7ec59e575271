// Minimal std-based stand-in for the Boost.StringAlgo calls the reference
// planner uses: trim, split(is_any_of, token_compress_on), to_lower.
#ifndef PW_SHIM_BOOST_ALGORITHM_STRING_HPP_
#define PW_SHIM_BOOST_ALGORITHM_STRING_HPP_

#include <algorithm>
#include <cctype>
#include <string>
#include <vector>

namespace boost {

enum token_compress_mode_type { token_compress_off, token_compress_on };

inline void trim(std::string& s) {
  auto not_space = [](unsigned char c) { return !std::isspace(c); };
  s.erase(s.begin(), std::find_if(s.begin(), s.end(), not_space));
  s.erase(std::find_if(s.rbegin(), s.rend(), not_space).base(), s.end());
}

inline void to_lower(std::string& s) {
  std::transform(s.begin(), s.end(), s.begin(),
                 [](unsigned char c) { return std::tolower(c); });
}

struct is_any_of_pred {
  std::string chars;
  bool operator()(char c) const {
    return chars.find(c) != std::string::npos;
  }
};

inline is_any_of_pred is_any_of(const std::string& chars) {
  return is_any_of_pred{chars};
}

template <typename Seq, typename Pred>
inline void split(Seq& out, const std::string& s, Pred pred,
                  token_compress_mode_type compress = token_compress_off) {
  out.clear();
  std::string cur;
  for (char c : s) {
    if (pred(c)) {
      if (!cur.empty() || compress == token_compress_off) {
        out.push_back(cur);
        cur.clear();
      }
    } else {
      cur.push_back(c);
    }
  }
  // Boost emits a trailing token (possibly empty when not compressing).
  if (!cur.empty() || compress == token_compress_off) {
    out.push_back(cur);
  }
}

}  // namespace boost

#endif  // PW_SHIM_BOOST_ALGORITHM_STRING_HPP_
