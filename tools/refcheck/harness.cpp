// Cross-validation harness: runs the reference MonkeyMoore on a data file and
// prints match offsets + equivalency maps for comparison with the Python
// oracle. Build-only tool, never shipped.
#include "mmoore/monkey_moore.hpp"
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

static std::vector<char32_t> parse_cps(const std::string &s) {
  std::vector<char32_t> out;
  std::stringstream ss(s);
  long v;
  while (ss >> v) out.push_back(static_cast<char32_t>(v));
  return out;
}

template <class Ty>
int run(const char *mode, const std::string &kw, const std::string &wc,
        const std::string &seq, const std::string &vals,
        const std::string &datafile) {
  std::ifstream f(datafile, std::ios::binary);
  std::vector<char> raw((std::istreambuf_iterator<char>(f)),
                        std::istreambuf_iterator<char>());
  const Ty *data = reinterpret_cast<const Ty *>(raw.data());
  uint64_t n = raw.size() / sizeof(Ty);

  std::vector<typename MonkeyMoore<Ty>::result_type> results;
  if (std::strcmp(mode, "value") == 0) {
    std::vector<short> rv;
    std::stringstream ss(vals);
    long v;
    while (ss >> v) rv.push_back(static_cast<short>(v));
    MonkeyMoore<Ty> m(rv);
    results = m.search(data, n);
  } else {
    auto kwcp = parse_cps(kw);
    auto seqcp = parse_cps(seq);
    char32_t wcc = wc.empty() ? 0 : static_cast<char32_t>(std::stol(wc));
    MonkeyMoore<Ty> m(kwcp, wcc, seqcp);
    results = m.search(data, n);
  }
  for (auto &[off, map] : results) {
    printf("%llu:", (unsigned long long)off);
    for (auto &[c, v] : map) printf(" %u=%u", (unsigned)c, (unsigned)v);
    printf("\n");
  }
  return 0;
}

int main(int argc, char **argv) {
  // argv: mode(simple|value) width(1|2) kw_cps wc_cp seq_cps vals datafile
  if (argc != 8) {
    fprintf(stderr, "usage: %s mode width kw wc seq vals datafile\n", argv[0]);
    return 2;
  }
  try {
    if (std::string(argv[2]) == "1")
      return run<uint8_t>(argv[1], argv[3], argv[4], argv[5], argv[6], argv[7]);
    return run<uint16_t>(argv[1], argv[3], argv[4], argv[5], argv[6], argv[7]);
  } catch (const std::exception &e) {
    printf("EXC %s\n", e.what());
    return 0;
  }
}
