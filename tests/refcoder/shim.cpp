// extern-C shim over the REFERENCE rANS implementation
// (/root/reference/third_party/CompressAI/cpp_exts/*.cpp, compiled verbatim
// alongside this file with the fake pybind11 headers in ./pybind11/).
// Gives the cross-coder parity tests a ctypes-loadable window onto the
// reference encoder/decoder/CDF-quantizer without pybind11 or any copying.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "rans_interface.hpp"

// from ops.cpp
std::vector<uint32_t> pmfToQuantizedCDF(const std::vector<float> &pmf,
                                        int precision);

namespace {
std::vector<std::vector<int32_t>> unflattenCdfs(const int32_t *cdfsFlat,
                                                int numCdfs, int stride,
                                                const int32_t *cdfLens) {
  std::vector<std::vector<int32_t>> cdfs(numCdfs);
  for (int i = 0; i < numCdfs; ++i) {
    cdfs[i].assign(cdfsFlat + (int64_t)i * stride,
                   cdfsFlat + (int64_t)i * stride + cdfLens[i]);
  }
  return cdfs;
}
} // namespace

extern "C" {

// pmf[n] -> out[n+1]; returns cdf length or -1 on the reference's
// domain_error (invalid pmf).
int refPmfToQuantizedCdf(const float *pmf, int n, int precision,
                         uint32_t *out) {
  try {
    std::vector<float> p(pmf, pmf + n);
    const auto cdf = pmfToQuantizedCDF(p, precision);
    std::memcpy(out, cdf.data(), cdf.size() * sizeof(uint32_t));
    return (int)cdf.size();
  } catch (...) {
    return -1;
  }
}

// Encode n symbols. cdfLens[i] = actual stored ints for cdf row i (the
// reference python passes rows of length k+1 while claiming size k+2;
// cdfSizes below is that claimed size). Returns byte count; *out is
// malloc'ed, free with refFree.
long refEncode(const int32_t *symbols, long n, const int32_t *indexes,
               const int32_t *cdfsFlat, int numCdfs, int stride,
               const int32_t *cdfLens, const int32_t *cdfSizes,
               const int32_t *offsets, uint8_t **out) {
  try {
    std::vector<int32_t> sym(symbols, symbols + n);
    std::vector<int32_t> idx(indexes, indexes + n);
    const auto cdfs = unflattenCdfs(cdfsFlat, numCdfs, stride, cdfLens);
    std::vector<int32_t> sizes(cdfSizes, cdfSizes + numCdfs);
    std::vector<int32_t> off(offsets, offsets + numCdfs);
    RansEncoder enc;
    const std::string bytes = enc.encodeWithIndexes(sym, idx, cdfs, sizes, off);
    *out = (uint8_t *)std::malloc(bytes.size());
    std::memcpy(*out, bytes.data(), bytes.size());
    return (long)bytes.size();
  } catch (...) {
    return -1;
  }
}

void refFree(uint8_t *p) { std::free(p); }

// Decode n symbols from a byte stream. Returns n or -1.
long refDecode(const uint8_t *data, long nbytes, const int32_t *indexes,
               long n, const int32_t *cdfsFlat, int numCdfs, int stride,
               const int32_t *cdfLens, const int32_t *cdfSizes,
               const int32_t *offsets, int32_t *outSymbols) {
  try {
    std::string encoded((const char *)data, (size_t)nbytes);
    std::vector<int32_t> idx(indexes, indexes + n);
    const auto cdfs = unflattenCdfs(cdfsFlat, numCdfs, stride, cdfLens);
    std::vector<int32_t> sizes(cdfSizes, cdfSizes + numCdfs);
    std::vector<int32_t> off(offsets, offsets + numCdfs);
    RansDecoder dec;
    const auto decoded = dec.decodeWithIndexes(encoded, idx, cdfs, sizes, off);
    if ((long)decoded.size() != n) return -1;
    std::memcpy(outSymbols, decoded.data(), n * sizeof(int32_t));
    return (long)decoded.size();
  } catch (...) {
    return -1;
  }
}

} // extern "C"
