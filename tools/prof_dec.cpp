// Paired host-decoder A/B vs system libzstd + gprof/CT_PROF target.
//   g++ -O2 -std=c++17 ... tools/prof_dec.cpp \
//       compress_tpu/_native/src/{zstd_dec,zstd_enc,entropy_standalone,checksum}.cpp \
//       -lzstd -o /tmp/prof_dec
//   /tmp/prof_dec <file> <lib_level> <iters> [size]
// Both decoders decode the SAME libzstd-produced frame (honest anchor).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <zstd.h>

extern "C" long long ct_zstd_decode_all(const uint8_t*, long long, uint8_t*,
                                        long long, long long, int);

static double now() {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
}

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: file lib_level iters [size]\n");
    return 2;
  }
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long long fn = ftell(f);
  fseek(f, 0, SEEK_SET);
  long long want = argc > 4 ? atoll(argv[4]) : (2ll << 20);
  uint8_t* src = (uint8_t*)malloc(want);
  long long got = fread(src, 1, fn < want ? fn : want, f);
  fclose(f);
  for (long long i = got; i < want; i++) src[i] = src[i % got];
  long long ccap = want + (want >> 1) + 4096;
  uint8_t* comp = (uint8_t*)malloc(ccap);
  int ll = atoi(argv[2]), iters = atoi(argv[3]);
  size_t cn = ZSTD_compress(comp, ccap, src, want, ll);
  // our decode_all contract: cap includes (1<<17)+64 block slack
  uint8_t* dst = (uint8_t*)malloc(want + (1 << 17) + 64);
  double bo = 0, bl = 0;
  long long on = 0;
  size_t ln = 0;
  for (int i = 0; i < iters; i++) {
    double t = now();
    on = ct_zstd_decode_all(comp, (long long)cn, dst, want + (1 << 17) + 64, 1ll << 27, 1);
    double d = now() - t;
    if (want / d > bo) bo = want / d;
    t = now();
    ln = ZSTD_decompress(dst, want + (1 << 17) + 64, comp, cn);
    d = now() - t;
    if (want / d > bl) bl = want / d;
  }
  if (on != (long long)want || ln != (size_t)want) {
    fprintf(stderr, "DECODE MISMATCH ours=%lld lib=%zu want=%lld\n", on, ln,
            want);
    return 1;
  }
  printf("dec lib-%d frame (%zu B): ours %.1f MB/s  lib %.1f MB/s  "
         "speed %.3fx\n",
         ll, cn, bo / 1e6, bl / 1e6, bo / bl);
#ifdef CT_PROF
  extern unsigned long long ct_phase_cycles[16];
  unsigned long long tot = 0;
  for (int i = 0; i < 16; i++) tot += ct_phase_cycles[i];
  for (int i = 0; i < 16; i++)
    if (ct_phase_cycles[i])
      printf("  phase %d  %6.1f%%\n", i, 100.0 * ct_phase_cycles[i] / tot);
#endif
  return 0;
}
