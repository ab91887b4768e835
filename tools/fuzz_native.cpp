// ASAN/UBSAN mutation fuzzer for the native decoders — the reference's
// -asan fuzz jobs / oss-fuzz role (go.yml:176-206, SURVEY §4). No clang /
// libFuzzer in this image, so coverage guidance is replaced by a corpus +
// deterministic xorshift mutation sweep; sanitizers still catch every
// OOB/UB the decoders hit.
//
// Build + run (tools/run_fuzz.sh):
//   g++ -O1 -g -std=c++17 -fsanitize=address,undefined \
//       -fno-sanitize-recover=all tools/fuzz_native.cpp \
//       compress_tpu/_native/src/{zstd_dec,flate,s2,entropy_standalone,checksum}.cpp \
//       -o /tmp/fuzz_native
//   /tmp/fuzz_native <corpus_dir> <execs_per_seed>
//
// Targets: ct_zstd_decode_all (frames), ct_inflate + ct_inflate_stream
// (deflate), ct_s2_decode_block (s2/snappy). Every call gets a fresh
// exactly-sized ASAN-tracked buffer so one-byte overreads trip.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>

extern "C" {
long long ct_zstd_scan_size(const uint8_t*, long long);
long long ct_zstd_decode_all(const uint8_t*, long long, uint8_t*, long long,
                             long long, int);
long long ct_inflate(const uint8_t*, long long, uint8_t*, long long);
long long ct_inflate_stream(const uint8_t*, long long, long long*, uint8_t*,
                            long long, long long, int*);
int ct_s2_decode_block(uint8_t*, uint64_t, const uint8_t*, uint64_t, int);
}

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t xrand() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

static void mutate(std::vector<uint8_t>& d) {
  if (d.empty()) return;
  switch (xrand() % 5) {
    case 0:  // bit flip
      d[xrand() % d.size()] ^= (uint8_t)(1u << (xrand() % 8));
      break;
    case 1:  // byte set
      d[xrand() % d.size()] = (uint8_t)xrand();
      break;
    case 2:  // truncate
      d.resize(1 + xrand() % d.size());
      break;
    case 3: {  // splice-duplicate a chunk
      size_t a = xrand() % d.size(), b = xrand() % d.size();
      if (a > b) std::swap(a, b);
      size_t len = b - a;
      if (len > 0 && len < 4096)
        d.insert(d.begin() + (xrand() % d.size()), d.begin() + a,
                 d.begin() + b);
      break;
    }
    case 4: {  // 4-byte magic/int stomp
      if (d.size() >= 4) {
        uint32_t v = (uint32_t)xrand();
        memcpy(&d[xrand() % (d.size() - 3)], &v, 4);
      }
      break;
    }
  }
}

static long long execs = 0;

static void run_one(const std::vector<uint8_t>& d) {
  // exact-size heap buffers: ASAN redzones catch one-byte overreads
  uint8_t* src = (uint8_t*)malloc(d.size() ? d.size() : 1);
  memcpy(src, d.data(), d.size());
  long long n = (long long)d.size();
  long long cap = 1 << 22;
  uint8_t* dst = (uint8_t*)malloc(cap);

  ct_zstd_decode_all(src, n, dst, cap, 1ll << 27, 0);
  // exact-size regime (the r5 decode-into-bytes path): cap is precisely
  // scan_size + slack, allocated at that size so ASAN catches any write
  // past the declared bound
  long long expected = ct_zstd_scan_size(src, n);
  if (expected >= 0 && expected <= (1 << 22)) {
    long long xcap = expected + (1 << 17) + 64;
    uint8_t* xdst = (uint8_t*)malloc(xcap);
    long long r = ct_zstd_decode_all(src, n, xdst, xcap, 1ll << 27, 0);
    if (r > expected) abort();  // decode must not exceed the scan bound
    free(xdst);
  }
  ct_inflate(src, n, dst, cap);
  long long bitpos = 0;
  int status = 0;
  ct_inflate_stream(src, n, &bitpos, dst, 0, cap, &status);
  ct_s2_decode_block(dst, cap, src, n, 1);
  ct_s2_decode_block(dst, cap, src, n, 0);

  free(dst);
  free(src);
  execs += 5;
}

int main(int argc, char** argv) {
  const char* dir = argc > 1 ? argv[1] : "fuzz_corpus";
  long long per_seed = argc > 2 ? atoll(argv[2]) : 200;
  DIR* dp = opendir(dir);
  if (!dp) {
    fprintf(stderr, "no corpus dir %s\n", dir);
    return 2;
  }
  std::vector<std::vector<uint8_t>> seeds;
  struct dirent* e;
  while ((e = readdir(dp))) {
    std::string p = std::string(dir) + "/" + e->d_name;
    FILE* f = fopen(p.c_str(), "rb");
    if (!f) continue;
    fseek(f, 0, SEEK_END);
    long long fn = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (fn <= 0 || fn > (4 << 20)) {
      fclose(f);
      continue;
    }
    std::vector<uint8_t> d(fn);
    if (fread(d.data(), 1, fn, f) == (size_t)fn) seeds.push_back(d);
    fclose(f);
  }
  closedir(dp);
  fprintf(stderr, "%zu seeds\n", seeds.size());
  // pass 1: every seed verbatim (reference crash corpora reproduce as-is)
  for (auto& s : seeds) run_one(s);
  // pass 2: mutation sweep
  for (auto& s : seeds) {
    for (long long i = 0; i < per_seed; i++) {
      std::vector<uint8_t> m = s;
      int rounds = 1 + (int)(xrand() % 4);
      for (int r = 0; r < rounds; r++) mutate(m);
      run_one(m);
    }
  }
  fprintf(stderr, "done: %lld execs, no sanitizer reports\n", execs);
  return 0;
}
