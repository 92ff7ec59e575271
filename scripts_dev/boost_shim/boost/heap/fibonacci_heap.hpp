// Minimal std::priority_queue-backed stand-in for the subset of
// boost::heap::fibonacci_heap the reference planner uses
// (push / top / pop / size / empty / clear with a boost::heap::compare
// template option).  Ordering semantics match (top() is the maximum per
// the comparator, i.e. the minimum priority with the planner's inverted
// comparators); only the unspecified tie order among equal priorities
// differs, which the reference itself treats as arbitrary (it randomizes
// action expansion order).  Asymptotics differ (binary heap pop/push are
// O(log n) vs amortized O(1) push) — measured impact on the planner is
// negligible because hashing + state expansion dominate.
#ifndef PW_SHIM_BOOST_HEAP_FIBONACCI_HEAP_HPP_
#define PW_SHIM_BOOST_HEAP_FIBONACCI_HEAP_HPP_

#include <queue>
#include <vector>

namespace boost {
namespace heap {

template <typename Compare>
struct compare {
  using type = Compare;
};

namespace detail_shim {
struct no_option {};
template <typename T>
struct compare_of {
  using type = std::less<T>;
};
template <typename T>
struct unwrap_compare {
  using type = T;
};
}  // namespace detail_shim

template <typename T, typename Option = detail_shim::no_option>
class fibonacci_heap;

// Specialization for the only instantiation pattern the reference uses:
// fibonacci_heap<T, boost::heap::compare<C>>.
template <typename T, typename C>
class fibonacci_heap<T, compare<C>> {
 private:
  std::priority_queue<T, std::vector<T>, C> m_q;

 public:
  using value_type = T;

  size_t size() const { return m_q.size(); }
  bool empty() const { return m_q.empty(); }
  void clear() {
    std::priority_queue<T, std::vector<T>, C> empty_q;
    m_q.swap(empty_q);
  }
  void push(const T& v) { m_q.push(v); }
  const T& top() const { return m_q.top(); }
  void pop() { m_q.pop(); }
};

}  // namespace heap
}  // namespace boost

#endif  // PW_SHIM_BOOST_HEAP_FIBONACCI_HEAP_HPP_
