// Paired host-encoder A/B vs system libzstd (same process, alternating
// iterations, best-of — this VM's absolute speed swings +-60%, the libzstd
// column is the honest scale). Also a gprof target when built with -pg.
//   g++ -O2 -std=c++17 -msse4.2 -mavx2 [-mbmi2 ...] tools/prof_enc.cpp \
//       compress_tpu/_native/src/zstd_enc.cpp -lzstd -o /tmp/prof_enc
//   /tmp/prof_enc <file> <our_level> <lib_level> <iters> [size]
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <zstd.h>

extern "C" long long ct_zstd_compress_level(const uint8_t*, long long,
                                            uint8_t*, long long, int,
                                            unsigned long long, int);

static double now() {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
}

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: file our_level lib_level iters [size]\n");
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long long fn = ftell(f);
  fseek(f, 0, SEEK_SET);
  long long want = argc > 5 ? atoll(argv[5]) : (2ll << 20);
  uint8_t* src = (uint8_t*)malloc(want);
  long long got = fread(src, 1, fn < want ? fn : want, f);
  fclose(f);
  for (long long i = got; i < want; i++) src[i] = src[i % got];  // wrap-fill
  long long cap = want + (want >> 1) + 4096;
  uint8_t* dst = (uint8_t*)malloc(cap);
  int lo = atoi(argv[2]), ll = atoi(argv[3]), iters = atoi(argv[4]);
  long long so = 0;
  size_t sl = 0;
  double bo = 0, bl = 0;
  for (int i = 0; i < iters; i++) {
    double t = now();
    so = ct_zstd_compress_level(src, want, dst, cap, 0, 0, lo);
    double d = now() - t;
    if (want / d > bo) bo = want / d;
    t = now();
    sl = ZSTD_compress(dst, cap, src, want, ll);
    d = now() - t;
    if (want / d > bl) bl = want / d;
  }
  printf("L%d vs lib-%d: ours %.1f MB/s (%lld B)  lib %.1f MB/s (%zu B)  "
         "speed %.3fx  size %.4fx\n",
         lo, ll, bo / 1e6, so, bl / 1e6, sl, bo / bl, (double)so / (double)sl);
#ifdef CT_PROF
  extern unsigned long long ct_phase_cycles[16];
  static const char* names[] = {"search", "lit hist+build", "huf streams",
                                "seq codes+hist", "choose_tab", "fse bits",
                                "", ""};
  unsigned long long tot = 0;
  for (int i = 0; i < 8; i++) tot += ct_phase_cycles[i];
  for (int i = 0; i < 8; i++)
    if (ct_phase_cycles[i])
      printf("  phase %d %-15s %6.1f%%\n", i, names[i],
             100.0 * ct_phase_cycles[i] / tot);
#endif
  return 0;
}
