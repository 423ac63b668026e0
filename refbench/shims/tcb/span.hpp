// Minimal tcb::span shim for building the reference performance_test in
// this container (the real tcbrindle/span is fetched by CMake, which is
// unavailable here). Wraps C++20 std::span under the tcb namespace with
// the handful of members the reference sources use.
#pragma once
#include <span>
#include <cstddef>

namespace tcb {
inline constexpr std::size_t dynamic_extent = std::dynamic_extent;

template <class T, std::size_t Extent = std::dynamic_extent>
using span = std::span<T, Extent>;

template <class T, std::size_t N>
auto make_span(T (&arr)[N]) {
    return std::span<T, N>(arr);
}
template <class Container>
auto make_span(Container& c) {
    return std::span<typename Container::value_type>(c.data(), c.size());
}
template <class Container>
auto make_span(const Container& c) {
    return std::span<const typename Container::value_type>(c.data(), c.size());
}
template <class T>
auto make_span(T* ptr, std::size_t count) {
    return std::span<T>(ptr, count);
}
}  // namespace tcb
