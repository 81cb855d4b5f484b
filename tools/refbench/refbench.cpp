// Reference-baseline timing driver (build-only tool, never shipped).
//
// Reproduces the reference's own benchmark setup
// (/root/reference/benchmarks/bench_search.cpp:11-66: mt19937(42) random
// data, 5-char keyword with optional wildcard at front/middle/back,
// bytes/s) against the reference MonkeyMoore core, without the Google
// Benchmark dependency.  Produces the numbers in BASELINE_MEASURED.json.
//
// Usage: refbench <width 1|2> <keyword> <wildcard-char-or-.> <bytes> [reps]
// Prints one line: best-of-reps seconds for a single search() call.
#include "mmoore/monkey_moore.hpp"

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <random>
#include <string>
#include <vector>

template <class Ty>
static std::vector<Ty> generate_data(size_t size_in_bytes) {
  // same generator/distribution as the reference bench so skip-table
  // behavior (and therefore walk length) is identical
  std::vector<Ty> data(size_in_bytes / sizeof(Ty));
  std::mt19937 rng(42);
  std::uniform_int_distribution<unsigned int> dist(
      0, std::numeric_limits<Ty>::max());
  for (auto &v : data) v = static_cast<Ty>(dist(rng));
  return data;
}

template <class Ty>
static int run(const std::string &kw, char wc, size_t bytes, int reps) {
  auto data = generate_data<Ty>(bytes);
  std::vector<CharType> keyword(kw.begin(), kw.end());
  MonkeyMoore<Ty> searcher(keyword, wc ? CharType(wc) : 0, {});

  double best = 1e300;
  volatile size_t sink = 0;  // keep the result alive
  for (int i = 0; i < reps; ++i) {
    auto t0 = std::chrono::steady_clock::now();
    auto results = searcher.search(data.data(), data.size());
    auto t1 = std::chrono::steady_clock::now();
    sink += results.size();
    double s = std::chrono::duration<double>(t1 - t0).count();
    if (s < best) best = s;
  }
  std::printf("%.9f %zu\n", best, (size_t)sink);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <width 1|2> <keyword> <wildcard|.> <bytes> "
                 "[reps]\n",
                 argv[0]);
    return 2;
  }
  int width = std::atoi(argv[1]);
  std::string kw = argv[2];
  char wc = (std::strcmp(argv[3], ".") == 0) ? 0 : argv[3][0];
  size_t bytes = std::strtoull(argv[4], nullptr, 10);
  int reps = argc > 5 ? std::atoi(argv[5]) : 5;
  if (width == 1) return run<uint8_t>(kw, wc, bytes, reps);
  if (width == 2) return run<uint16_t>(kw, wc, bytes, reps);
  std::fprintf(stderr, "width must be 1 or 2\n");
  return 2;
}
