// zstd L1 encoder — host-side native core (RFC 8878).
//
// The reference's enc_fast.go role: single hash-table greedy matcher with
// repeat-offset probe and backward extension; literals as huff0 4X with a
// raw-nibble weight table; sequences with per-block real FSE tables when
// there are enough of them, predefined otherwise (the reference's
// chooseComp role, blockenc.go:633). Output is a complete single frame; the
// pure-Python encoder (zstd/encoder.py) remains the full-featured path
// (levels 2-4, dictionaries, custom tables) and the differential oracle.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

static inline uint64_t ld64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}
static inline uint32_t ld32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
static inline uint32_t zhash(uint64_t v, int bits) {
  return (uint32_t)(((v << 32) * 0x9E3779B185EBCA87ULL) >> (64 - bits));
}
static inline int highbit(uint32_t v) { return 31 - __builtin_clz(v); }

// ---------------------------------------------------------------------------
// forward LSB-first bit writer with 1-bit end marker (fse/core BitWriter)
// ---------------------------------------------------------------------------

struct BitW {
  uint8_t* out;
  long long n;
  uint64_t acc;
  int bits;
};
static inline void bw_init(BitW* w, uint8_t* out) {
  w->out = out;
  w->n = 0;
  w->acc = 0;
  w->bits = 0;
}
static inline void bw_add(BitW* w, uint32_t v, int nb) {
  w->acc |= ((uint64_t)v & ((1ull << nb) - 1)) << w->bits;
  w->bits += nb;
  while (w->bits >= 8) {
    w->out[w->n++] = (uint8_t)w->acc;
    w->acc >>= 8;
    w->bits -= 8;
  }
}
static inline long long bw_close(BitW* w) {
  bw_add(w, 1, 1);
  if (w->bits) {
    w->out[w->n++] = (uint8_t)w->acc;
    w->acc = 0;
    w->bits = 0;
  }
  return w->n;
}

// ---------------------------------------------------------------------------
// huff0 encode: Kraft lengths + canonical codes + raw-nibble table
// ---------------------------------------------------------------------------

struct Huf {
  uint16_t code[256];
  uint8_t nbits[256];
  int max_bits;
  uint8_t table[136];
  int table_len;
};

// gain-per-cost greedy (mirrors zdev._huff_build): l0 = ceil(-log2 p),
// then shorten best hist/cost first until the Kraft deficit is zero.
static bool huf_build(const uint32_t* hist, long long total, Huf* h) {
  int l[256];
  int present = 0, last = -1;
  for (int s = 0; s < 256; s++) {
    l[s] = 0;
    if (hist[s]) {
      present++;
      last = s;
      // smallest l with hist*2^l >= total, clamped to [1, 11]
      int v = 1;
      while (v < 11 && ((uint64_t)hist[s] << v) < (uint64_t)total) v++;
      l[s] = v;
    }
  }
  if (present < 2) return false;
  long long kraft = 0;
  for (int s = 0; s < 256; s++)
    if (l[s]) kraft += 1ll << (11 - l[s]);
  long long d = (1ll << 11) - kraft;
  if (d < 0) return false;
  while (d > 0) {
    // best gain-per-cost single-level shortening with cost <= d
    int best = -1;
    double best_score = -1;
    for (int s = 0; s < 256; s++) {
      if (l[s] <= 1) continue;
      long long cost = 1ll << (11 - l[s]);
      if (cost > d) continue;
      double score = (double)hist[s] / (double)cost;
      if (score > best_score) {
        best_score = score;
        best = s;
      }
    }
    if (best < 0) return false;
    d -= 1ll << (11 - l[best]);
    l[best]--;
  }
  int mb = 0;
  for (int s = 0; s < 256; s++)
    if (l[s] > mb) mb = l[s];
  h->max_bits = mb;
  // canonical codes: levels nb descending, symbols ascending
  uint32_t start = 0;
  for (int nb = mb; nb >= 1; nb--) {
    uint32_t span = 1u << (mb - nb);
    for (int s = 0; s < 256; s++) {
      if (l[s] != nb) continue;
      h->code[s] = (uint16_t)(start >> (mb - nb));
      h->nbits[s] = (uint8_t)nb;
      start += span;
    }
  }
  if (start != (1u << mb)) return false;
  for (int s = 0; s < 256; s++)
    if (!l[s]) h->nbits[s] = 0;
  // raw-nibble weight table: weights for symbols 0..last-1 (last implied)
  int nw = last;  // explicit weights exclude the last present symbol
  if (nw > 128) return false;
  h->table[0] = (uint8_t)(127 + nw);
  for (int i = 0; i < nw; i += 2) {
    int w1 = l[i] ? mb + 1 - l[i] : 0;
    int w2 = (i + 1 < nw) ? (l[i + 1] ? mb + 1 - l[i + 1] : 0) : 0;
    h->table[1 + i / 2] = (uint8_t)((w1 << 4) | w2);
  }
  h->table_len = 1 + (nw + 1) / 2;
  return true;
}

static long long huf_stream(const Huf* h, const uint8_t* p, long long n,
                            uint8_t* out) {
  BitW w;
  bw_init(&w, out);
  for (long long i = n - 1; i >= 0; i--) bw_add(&w, h->code[p[i]], h->nbits[p[i]]);
  return bw_close(&w);
}

// ---------------------------------------------------------------------------
// predefined FSE encode tables (built once)
// ---------------------------------------------------------------------------

struct CTab {
  uint16_t state_table[512];
  int32_t delta_nb[64];
  int32_t delta_fs[64];
  int log;
};

static void ctab_build(const int16_t* norm, int nsym, int log, CTab* t) {
  int size = 1 << log;
  t->log = log;
  uint8_t spread[512];
  int high = size - 1;
  for (int s = 0; s < nsym; s++)
    if (norm[s] == -1) spread[high--] = (uint8_t)s;
  int step = (size >> 1) + (size >> 3) + 3, mask = size - 1, pos = 0;
  for (int s = 0; s < nsym; s++)
    for (int i = 0; i < norm[s]; i++) {
      spread[pos] = (uint8_t)s;
      do {
        pos = (pos + step) & mask;
      } while (pos > high);
    }
  int cumul[65];
  cumul[0] = 0;
  for (int s = 0; s < nsym; s++)
    cumul[s + 1] = cumul[s] + (norm[s] == -1 ? 1 : (norm[s] < 0 ? 0 : norm[s]));
  int cpos[64];
  for (int s = 0; s < nsym; s++) cpos[s] = cumul[s];
  for (int u = 0; u < size; u++) t->state_table[cpos[spread[u]]++] = (uint16_t)(size + u);
  int total = 0;
  for (int s = 0; s < nsym; s++) {
    int c = norm[s];
    if (c == 0) {
      t->delta_nb[s] = ((log + 1) << 16) - size;
      t->delta_fs[s] = 0;
    } else if (c == -1 || c == 1) {
      t->delta_nb[s] = (log << 16) - size;
      t->delta_fs[s] = total - 1;
      total += 1;
    } else {
      int mbo = log - highbit((uint32_t)(c - 1));
      t->delta_nb[s] = (mbo << 16) - (c << mbo);
      t->delta_fs[s] = total - c;
      total += c;
    }
  }
}

static const int16_t PRE_LL[36] = {4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
                                   2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
                                   2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1};
static const int16_t PRE_OF[29] = {1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1,
                                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1,
                                   -1, -1};
static const int16_t PRE_ML[53] = {1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
                                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                                   1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1};
static CTab g_ll, g_of, g_ml;
static bool g_init = false;

// largest-remainder normalization (fse/core.py normalize_count semantics;
// no -1 low-prob entries for simplicity — every present symbol gets >= 1)
static bool normalize_c(const uint32_t* hist, int nsym, long long total,
                        int log, int16_t* norm) {
  int size = 1 << log;
  int present = 0;
  for (int s = 0; s < nsym; s++) {
    norm[s] = 0;
    if (hist[s]) present++;
  }
  if (present < 2 || present > size) return false;
  long long acc = 0;
  double fr[64];
  for (int s = 0; s < nsym; s++) {
    if (!hist[s]) { fr[s] = -1; continue; }
    double ideal = (double)hist[s] * size / (double)total;
    long long b = (long long)ideal;
    if (b < 1) b = 1;
    norm[s] = (int16_t)b;
    fr[s] = ideal - (double)b;
    acc += b;
  }
  long long diff = size - acc;
  while (diff > 0) {  // hand out by largest remainder
    int best = -1;
    double bf = -2;
    for (int s = 0; s < nsym; s++)
      if (hist[s] && fr[s] > bf) { bf = fr[s]; best = s; }
    norm[best]++; fr[best] -= 1.0; diff--;
  }
  while (diff < 0) {  // steal from the largest
    int best = -1;
    for (int s = 0; s < nsym; s++)
      if (norm[s] > 1 && (best < 0 || norm[s] > norm[best])) best = s;
    if (best < 0) return false;
    norm[best]--; diff++;
  }
  return true;
}

// serialize NCount (fse/core.py write_ncount)
static int write_ncount_c(const int16_t* norm, int max_sym, int log,
                          uint8_t* out) {
  long long bs = 0;
  int bc = 0, n = 0;
  auto put = [&](int v, int nb) {
    bs |= (long long)(v & ((1 << nb) - 1)) << bc;
    bc += nb;
    while (bc >= 16) {
      out[n++] = (uint8_t)bs;
      out[n++] = (uint8_t)(bs >> 8);
      bs >>= 16;
      bc -= 16;
    }
  };
  int size = 1 << log;
  put(log - 5, 4);
  int remaining = size + 1, threshold = size, nb_bits = log + 1;
  int s = 0;
  bool prev0 = false;
  while (remaining > 1 && s <= max_sym) {
    if (prev0) {
      int start = s;
      while (s <= max_sym && norm[s] == 0) s++;
      int run = s - start;
      while (run >= 24) { put(0xFFFF, 16); run -= 24; }
      while (run >= 3) { put(3, 2); run -= 3; }
      put(run, 2);
      if (s > max_sym) break;
    }
    int count = norm[s];
    s++;
    int mx = (2 * threshold - 1) - remaining;
    remaining -= count < 0 ? -count : count;
    count += 1;
    if (count >= threshold) count += mx;
    put(count, nb_bits - (count < mx ? 1 : 0));
    prev0 = count == 1;
    while (remaining < threshold) { nb_bits--; threshold >>= 1; }
  }
  while (bc > 0) {
    out[n++] = (uint8_t)bs;
    bs >>= 8;
    bc -= 8;
  }
  return n;
}

static const uint32_t LL_BASE[36] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18,
    20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768, 65536};
static const uint8_t LL_XBITS[36] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                     0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
                                     4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                                     16};
static const uint32_t ML_BASE[53] = {
    3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39, 41,
    43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099, 8195,
    16387, 32771, 65539};
static const uint8_t ML_XBITS[53] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                                     0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3,
                                     3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14,
                                     15, 16};

static inline int ll_code(uint32_t ll) {
  static const uint8_t small[64] = {
      0,  1,  2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15,
      16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 20, 20, 21, 21, 21, 21,
      22, 22, 22, 22, 22, 22, 22, 22, 23, 23, 23, 23, 23, 23, 23, 23,
      24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24};
  return ll < 64 ? small[ll] : highbit(ll) + 19;
}
static inline int ml_code(uint32_t ml) {
  uint32_t v = ml - 3;
  static const uint8_t small[64] = {
      0,  1,  2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15,
      16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31,
      32, 32, 33, 33, 34, 34, 35, 35, 36, 36, 36, 36, 37, 37, 37, 37,
      38, 38, 38, 38, 38, 38, 38, 38, 39, 39, 39, 39, 39, 39, 39, 39};
  if (v < 64) return small[v];
  if (v < 128) return v < 80 ? 40 : (v < 96 ? 41 : 42);
  return highbit(v) + 36;
}

static inline int cinit(const CTab* t, int sym) {
  int nb = (t->delta_nb[sym] + (1 << 15)) >> 16;
  int im = (nb << 16) - t->delta_nb[sym];
  return t->state_table[(im >> nb) + t->delta_fs[sym]];
}
static inline int cenc(const CTab* t, BitW* w, int state, int sym) {
  int nb = (state + t->delta_nb[sym]) >> 16;
  bw_add(w, (uint32_t)state, nb);
  return t->state_table[(state >> nb) + t->delta_fs[sym]];
}

// ---------------------------------------------------------------------------
// the encoder
// ---------------------------------------------------------------------------

#define HBITS 16
#define MAXSEQ_PER_BLOCK ((1 << 17) / 4 + 8)

struct Seq {
  uint32_t ll, ml, ofv;
};

// encode the block sequence covering src[start, n) into dst (no frame
// header). Matches may reach back into [0, start) (overlap prefix).
// mark_last sets the last-block flag on the final block.
static long long encode_blocks_(const uint8_t* src, long long n,
                                long long start, uint8_t* dst, long long cap,
                                int mark_last) {
  if (n - start <= 0 || n > (1ll << 31) - (1 << 20)) return -1;
  if (!g_init) {
    ctab_build(PRE_LL, 36, 6, &g_ll);
    ctab_build(PRE_OF, 29, 5, &g_of);
    ctab_build(PRE_ML, 53, 6, &g_ml);
    g_init = true;
  }
  int32_t* table = (int32_t*)malloc(sizeof(int32_t) << HBITS);
  if (!table) return -1;
  memset(table, -1, sizeof(int32_t) << HBITS);
  Seq* seqs = (Seq*)malloc(sizeof(Seq) * MAXSEQ_PER_BLOCK);
  uint8_t* lc_s = (uint8_t*)malloc(3 * MAXSEQ_PER_BLOCK);
  uint8_t* mc_s = lc_s ? lc_s + MAXSEQ_PER_BLOCK : nullptr;
  uint8_t* oc_s = lc_s ? lc_s + 2 * MAXSEQ_PER_BLOCK : nullptr;
  uint8_t* lits = (uint8_t*)malloc(1 << 17);
  uint8_t* scratch = (uint8_t*)malloc(1 << 20);  // block body (worst case)
  uint8_t* stage = (uint8_t*)malloc(1 << 19);    // 4X stream staging
  if (!seqs || !lits || !scratch || !stage || !lc_s) {
    free(table); free(seqs); free(lits); free(scratch); free(stage);
    free(lc_s);
    return -1;
  }

  long long d = 0;
  long long window = n < (8ll << 20) ? n : (8ll << 20);
  if (window < 1024) window = 1024;

  uint32_t rep1 = 1;
  long long pos = start;
  // seed the hash table with some prefix positions
  for (long long q = start > 32768 ? start - 32768 : 0; q + 8 < start; q += 2)
    table[zhash(ld64(src + q), HBITS)] = (int32_t)q;
  while (pos < n) {
    long long bend = pos + (1 << 17) < n ? pos + (1 << 17) : n;
    long long regen = bend - pos;
    int last = mark_last && bend == n;

    // ---- greedy match search over [pos, bend) --------------------------
    long long nseq = 0, lit_n = 0;
    long long s = pos == 0 ? 1 : pos;
    long long next_emit = pos;
    if (regen >= 32) {
      long long limit = bend - 16;
      while (s < limit) {
        // probe
        long long cand = -1;
        while (s < limit) {
          uint64_t v = ld64(src + s);
          uint32_t hsh = zhash(v, HBITS);
          long long c = table[hsh];
          table[hsh] = (int32_t)s;
          if (rep1 && s >= (long long)rep1 &&
              ld32(src + s) == ld32(src + s - rep1)) {
            cand = s - rep1;
            break;
          }
          if (c >= 0 && s - c <= window && ld32(src + c) == (uint32_t)v) {
            cand = c;
            break;
          }
          s += 1 + ((s - next_emit) >> 6);
        }
        if (s >= limit) break;
        // backward extension
        while (s > next_emit && cand > 0 && src[s - 1] == src[cand - 1]) {
          s--;
          cand--;
        }
        // forward extension, 8 bytes at a time (matchLen XOR+ctz)
        long long m = 4;
        long long maxm = bend - s;
        while (m + 8 <= maxm) {
          uint64_t x = ld64(src + cand + m) ^ ld64(src + s + m);
          if (x) {
            m += __builtin_ctzll(x) >> 3;
            goto ext_done;
          }
          m += 8;
        }
        while (m < maxm && src[cand + m] == src[s + m]) m++;
      ext_done:;
        long long ll = s - next_emit;
        memcpy(lits + lit_n, src + next_emit, ll);
        lit_n += ll;
        seqs[nseq].ll = (uint32_t)ll;
        seqs[nseq].ml = (uint32_t)m;
        uint32_t off = (uint32_t)(s - cand);
        seqs[nseq].ofv = off + 3;  // rep codes: only rep1 probe, plain emit
        nseq++;
        rep1 = off;
        s += m;
        next_emit = s;
        if (s + 16 > bend) break;
        // insert a couple of positions inside the match
        uint64_t v1 = ld64(src + s - 2);
        table[zhash(v1, HBITS)] = (int32_t)(s - 2);
        if (nseq >= MAXSEQ_PER_BLOCK - 2) break;
      }
    }
    long long tail = bend - next_emit;
    memcpy(lits + lit_n, src + next_emit, tail);
    lit_n += tail;

    // ---- assemble block -------------------------------------------------
    long long body = 0;
    uint8_t* ob = scratch;
    bool ok = nseq > 0;
    if (ok) {
      // literals section
      uint32_t hist[256] = {0};
      for (long long i = 0; i < lit_n; i++) hist[lits[i]]++;
      Huf hf;
      long long lit_sec = -1;
      if (lit_n >= 256 && huf_build(hist, lit_n, &hf)) {
        long long seg = (lit_n + 3) / 4;
        long long ls[4];
        long long streams = 0;
        for (int q = 0; q < 4; q++) {
          long long a = q * seg;
          long long b = q < 3 ? a + seg : lit_n;
          ls[q] = huf_stream(&hf, lits + a, b - a, stage + streams);
          streams += ls[q];
        }
        long long total4 = hf.table_len + 6 + streams;
        if (ls[0] <= 0xFFFF && ls[1] <= 0xFFFF && ls[2] <= 0xFFFF &&
            total4 + 5 < lit_n) {
          // header (size_format 3: 5 bytes, covers all sizes)
          uint64_t v = 2 | (3u << 2) | ((uint64_t)lit_n << 4)
                       | ((uint64_t)total4 << 22);
          for (int i = 0; i < 5; i++) ob[body + i] = (uint8_t)(v >> (8 * i));
          long long hdr = 5;
          memcpy(ob + body + hdr, hf.table, hf.table_len);
          hdr += hf.table_len;
          for (int q = 0; q < 3; q++) {
            ob[body + hdr] = (uint8_t)ls[q];
            ob[body + hdr + 1] = (uint8_t)(ls[q] >> 8);
            hdr += 2;
          }
          memcpy(ob + body + hdr, stage, streams);
          lit_sec = 5 + total4;
          body += lit_sec;
        }
      }
      if (lit_sec < 0) {  // raw literals
        uint64_t v = 0 | (3u << 2) | ((uint64_t)lit_n << 4);
        ob[body] = (uint8_t)v;
        ob[body + 1] = (uint8_t)(v >> 8);
        ob[body + 2] = (uint8_t)(v >> 16);
        memcpy(ob + body + 3, lits, lit_n);
        body += 3 + lit_n;
      }
      // sequences section
      if (nseq < 128) {
        ob[body++] = (uint8_t)nseq;
      } else if (nseq < 0x7F00) {
        ob[body++] = (uint8_t)(128 + (nseq >> 8));
        ob[body++] = (uint8_t)nseq;
      } else {
        ob[body++] = 255;
        ob[body++] = (uint8_t)(nseq - 0x7F00);
        ob[body++] = (uint8_t)((nseq - 0x7F00) >> 8);
      }
      // per-seq codes + histograms
      uint32_t h_ll[64] = {0}, h_ml[64] = {0}, h_of[64] = {0};
      int max_lc = 0, max_mc = 0, max_oc = 0;
      for (long long i = 0; i < nseq; i++) {
        int lc = ll_code(seqs[i].ll), mc = ml_code(seqs[i].ml),
            oc = highbit(seqs[i].ofv);
        lc_s[i] = (uint8_t)lc; mc_s[i] = (uint8_t)mc; oc_s[i] = (uint8_t)oc;
        h_ll[lc]++; h_ml[mc]++; h_of[oc]++;
        if (lc > max_lc) max_lc = lc;
        if (mc > max_mc) max_mc = mc;
        if (oc > max_oc) max_oc = oc;
      }
      // table choice per stream: custom FSE when enough sequences,
      // else predefined (reference chooseComp, blockenc.go:633)
      CTab c_ll, c_of, c_ml;
      const CTab *t_ll = &g_ll, *t_of = &g_of, *t_ml = &g_ml;
      int m_ll = 0, m_of = 0, m_ml = 0;
      uint8_t nc_buf[3][80];
      int nc_len[3] = {0, 0, 0};
      int16_t norm[64];
      if (nseq >= 300) {
        if (normalize_c(h_ll, max_lc + 1, nseq, 9, norm)) {
          nc_len[0] = write_ncount_c(norm, max_lc, 9, nc_buf[0]);
          ctab_build(norm, max_lc + 1, 9, &c_ll);
          t_ll = &c_ll; m_ll = 2;
        }
        if (normalize_c(h_of, max_oc + 1, nseq, 8, norm)) {
          nc_len[1] = write_ncount_c(norm, max_oc, 8, nc_buf[1]);
          ctab_build(norm, max_oc + 1, 8, &c_of);
          t_of = &c_of; m_of = 2;
        }
        if (normalize_c(h_ml, max_mc + 1, nseq, 9, norm)) {
          nc_len[2] = write_ncount_c(norm, max_mc, 9, nc_buf[2]);
          ctab_build(norm, max_mc + 1, 9, &c_ml);
          t_ml = &c_ml; m_ml = 2;
        }
      }
      ob[body++] = (uint8_t)((m_ll << 6) | (m_of << 4) | (m_ml << 2));
      memcpy(ob + body, nc_buf[0], nc_len[0]); body += nc_len[0];
      memcpy(ob + body, nc_buf[1], nc_len[1]); body += nc_len[1];
      memcpy(ob + body, nc_buf[2], nc_len[2]); body += nc_len[2];

      BitW w;
      bw_init(&w, ob + body);
      long long i = nseq - 1;
      int lc = lc_s[i], mc = mc_s[i], oc = oc_s[i];
      bw_add(&w, seqs[i].ll - LL_BASE[lc], LL_XBITS[lc]);
      bw_add(&w, seqs[i].ml - ML_BASE[mc], ML_XBITS[mc]);
      bw_add(&w, seqs[i].ofv - (1u << oc), oc);
      int st_ll = cinit(t_ll, lc), st_ml = cinit(t_ml, mc),
          st_of = cinit(t_of, oc);
      for (i = nseq - 2; i >= 0; i--) {
        lc = lc_s[i]; mc = mc_s[i]; oc = oc_s[i];
        st_of = cenc(t_of, &w, st_of, oc);
        st_ml = cenc(t_ml, &w, st_ml, mc);
        st_ll = cenc(t_ll, &w, st_ll, lc);
        bw_add(&w, seqs[i].ll - LL_BASE[lc], LL_XBITS[lc]);
        bw_add(&w, seqs[i].ml - ML_BASE[mc], ML_XBITS[mc]);
        bw_add(&w, seqs[i].ofv - (1u << oc), oc);
      }
      bw_add(&w, (uint32_t)(st_ml - (1 << t_ml->log)), t_ml->log);
      bw_add(&w, (uint32_t)(st_of - (1 << t_of->log)), t_of->log);
      bw_add(&w, (uint32_t)(st_ll - (1 << t_ll->log)), t_ll->log);
      body += bw_close(&w);
      ok = body < regen;
    }

    if (d + 3 + (ok ? body : regen) + 8 > cap) {
      free(table); free(seqs); free(lits); free(scratch); free(stage);
      free(lc_s);
      return -1;
    }
    if (ok) {
      uint32_t bh = (uint32_t)((last ? 1 : 0) | (2 << 1) | (body << 3));
      memcpy(dst + d, &bh, 3);
      d += 3;
      memcpy(dst + d, ob, body);
      d += body;
    } else {
      uint32_t bh = (uint32_t)((last ? 1 : 0) | (0 << 1) | (regen << 3));
      memcpy(dst + d, &bh, 3);
      d += 3;
      memcpy(dst + d, src + pos, regen);
      d += regen;
    }
    pos = bend;
  }
  free(table); free(seqs); free(lits); free(scratch); free(stage);
  free(lc_s);
  return d;
}

// full single frame (header + blocks + optional checksum)
long long ct_zstd_compress(const uint8_t* src, long long n, uint8_t* dst,
                           long long cap, int checksum,
                           unsigned long long xxh) {
  if (n <= 16) return -1;
  long long d = 0;
  memcpy(dst + d, "\x28\xb5\x2f\xfd", 4);
  d += 4;
  long long window = n < (8ll << 20) ? n : (8ll << 20);
  if (window < 1024) window = 1024;
  int wlog = 10;
  while ((1ll << (wlog + 1)) <= window) wlog++;
  long long wbase = 1ll << wlog;
  int mantissa = (int)((window - wbase) / (wbase >> 3));
  if (wbase + (long long)mantissa * (wbase >> 3) < window) mantissa++;
  if (mantissa > 7) { mantissa = 0; wlog++; }
  dst[d++] = (uint8_t)((2 << 6) | (checksum ? 4 : 0));
  dst[d++] = (uint8_t)(((wlog - 10) << 3) | mantissa);
  memcpy(dst + d, &n, 4);
  d += 4;
  long long b = encode_blocks_(src, n, 0, dst + d, cap - d - 8, 1);
  if (b < 0) return -1;
  d += b;
  if (checksum) {
    uint32_t c = (uint32_t)xxh;
    memcpy(dst + d, &c, 4);
    d += 4;
  }
  return d;
}

// job entry for host-parallel frames (reference enc_jobs): encodes
// src[start, n) as non-final blocks, matching into the prefix [0, start)
long long ct_zstd_compress_blocks(const uint8_t* src, long long n,
                                  long long start, uint8_t* dst,
                                  long long cap) {
  return encode_blocks_(src, n, start, dst, cap, 0);
}

}  // extern "C"
