// Minimal compile-time stand-in for pybind11, used ONLY to compile the
// reference rANS sources (/root/reference/third_party/CompressAI/cpp_exts/*)
// verbatim into a plain shared library for cross-coder parity tests.
// `py::bytes` becomes std::string; the binding-registration surface
// (module_/class_/arg/init) compiles to no-ops. No Python C API involved.
#pragma once

// The real pybind11 headers transitively provide these; the reference
// sources rely on that.
#include <cassert>
#include <cstdint>
#include <stdexcept>
#include <string>
#include <vector>

namespace pybind11 {

using bytes = std::string;

struct arg {
  explicit arg(const char *) {}
};

struct module_ {
  template <typename... A> module_ &def(A &&...) { return *this; }
};

template <typename... T> struct class_ {
  template <typename... A> explicit class_(A &&...) {}
  template <typename... A> class_ &def(A &&...) { return *this; }
};

template <typename... A> inline int init() { return 0; }

} // namespace pybind11

// PYBIND11_MODULE is not provided: the module-assembly TU (rans.cpp) is
// deliberately excluded from the build.
