// DEFLATE (RFC 1951) — host-side native core.
//
// Encoder: greedy hash matcher (32 KiB window, min match 3) + dynamic
// canonical Huffman blocks with the code-length RLE header; stored-block
// fallback. Decoder: table-driven canonical decode for stored/fixed/
// dynamic blocks. The Python implementations (flate/deflate.py,
// flate/inflate.py) remain the full-featured paths (levels -2..9, custom
// windows, checkpoints) and the differential oracles.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

static inline uint64_t fld64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}
static inline uint32_t fld32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
static inline int fhighbit(uint32_t v) { return 31 - __builtin_clz(v); }
static inline uint32_t fhash(uint32_t v, int bits) {
  return (v * 0x9E3779B1u) >> (32 - bits);
}
static inline uint32_t bitrev(uint32_t code, int len) {
  uint32_t r = 0;
  for (int i = 0; i < len; i++) {
    r = (r << 1) | (code & 1);
    code >>= 1;
  }
  return r;
}

// LSB-first bit writer (deflate bit order); huffman codes pre-reversed
struct FW {
  uint8_t* out;
  long long n;
  uint64_t acc;
  int bits;
};
static inline void fw_bits(FW* w, uint32_t v, int nb) {
  w->acc |= ((uint64_t)v & ((1ull << nb) - 1)) << w->bits;
  w->bits += nb;
  while (w->bits >= 8) {
    w->out[w->n++] = (uint8_t)w->acc;
    w->acc >>= 8;
    w->bits -= 8;
  }
}
static inline void fw_align(FW* w) {
  if (w->bits) {
    w->out[w->n++] = (uint8_t)w->acc;
    w->acc = 0;
    w->bits = 0;
  }
}

// ---- length/distance code tables (RFC 1951 §3.2.5) ------------------------

static const uint16_t LEN_BASE[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11, 13,
                                      15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
                                      67, 83, 99, 115, 131, 163, 195, 227, 258};
static const uint8_t LEN_XB[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                   2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
static const uint16_t DST_BASE[30] = {
    1,    2,    3,    4,    5,    7,     9,     13,    17,   25,
    33,   49,   65,   97,   129,  193,   257,   385,   513,  769,
    1025, 1537, 2049, 3073, 4097, 6145,  8193,  12289, 16385, 24577};
static const uint8_t DST_XB[30] = {0, 0, 0, 0, 1, 1, 2, 2,  3,  3,  4,  4,
                                   5, 5, 6, 6, 7, 7, 8, 8,  9,  9,  10, 10,
                                   11, 11, 12, 12, 13, 13};

static inline int len_code(int l) {  // l in [3, 258]
  if (l == 258) return 28;
  int v = l - 3;
  if (v < 8) return v;
  int hb = fhighbit((uint32_t)v);
  return ((hb - 1) << 2) + ((v >> (hb - 2)) & 3);
}
static inline int dst_code(int d) {  // d in [1, 32768]
  if (d <= 4) return d - 1;
  int hb = fhighbit((uint32_t)(d - 1));
  return hb * 2 + (((d - 1) >> (hb - 1)) & 1);
}

// ---- canonical huffman lengths (Kraft greedy, limit <= maxlen) ------------

static bool build_lengths(const uint32_t* hist, int nsym, int maxlen,
                          uint8_t* lens) {
  long long total = 0;
  int present = 0;
  for (int s = 0; s < nsym; s++) {
    lens[s] = 0;
    total += hist[s];
    if (hist[s]) present++;
  }
  if (present == 0) return false;
  if (present == 1) {  // degenerate: give it length 1
    for (int s = 0; s < nsym; s++)
      if (hist[s]) lens[s] = 1;
    return true;
  }
  int l[320];
  for (int s = 0; s < nsym; s++) {
    l[s] = 0;
    if (!hist[s]) continue;
    int v = 1;
    while (v < maxlen && ((uint64_t)hist[s] << v) < (uint64_t)total) v++;
    l[s] = v;
  }
  long long kraft = 0;
  for (int s = 0; s < nsym; s++)
    if (l[s]) kraft += 1ll << (maxlen - l[s]);
  long long d = (1ll << maxlen) - kraft;
  if (d < 0) return false;
  while (d > 0) {
    int best = -1;
    double bs = -1;
    for (int s = 0; s < nsym; s++) {
      if (l[s] <= 1) continue;
      long long cost = 1ll << (maxlen - l[s]);
      if (cost > d) continue;
      double sc = (double)hist[s] / (double)cost;
      if (sc > bs) { bs = sc; best = s; }
    }
    if (best < 0) break;  // leave the code incomplete-but-valid? no: pad
    d -= 1ll << (maxlen - l[best]);
    l[best]--;
  }
  if (d != 0) return false;
  for (int s = 0; s < nsym; s++) lens[s] = (uint8_t)l[s];
  return true;
}

static void canon_codes(const uint8_t* lens, int nsym, uint16_t* codes) {
  int bl_count[16] = {0};
  for (int s = 0; s < nsym; s++) bl_count[lens[s]]++;
  bl_count[0] = 0;
  uint32_t next[16];
  uint32_t code = 0;
  for (int b = 1; b <= 15; b++) {
    code = (code + bl_count[b - 1]) << 1;
    next[b] = code;
  }
  for (int s = 0; s < nsym; s++)
    codes[s] = lens[s] ? (uint16_t)bitrev(next[lens[s]]++, lens[s]) : 0;
}

// ---------------------------------------------------------------------------
// deflate
// ---------------------------------------------------------------------------

struct Tok {  // literal: dist=0, val=byte; match: val=len, dist=distance
  uint16_t val, dist;
};

#define FHB 15
#define FBLOCK (1 << 16)

long long ct_deflate(const uint8_t* src, long long n, uint8_t* dst,
                     long long cap) {
  if (n < 0 || cap < n + n / 8 + 64) return -1;
  int32_t* table = (int32_t*)malloc(sizeof(int32_t) << FHB);
  Tok* toks = (Tok*)malloc(sizeof(Tok) * (FBLOCK + 16));
  if (!table || !toks) {
    free(table);
    free(toks);
    return -1;
  }
  memset(table, -1, sizeof(int32_t) << FHB);
  FW w;
  w.out = dst;
  w.n = 0;
  w.acc = 0;
  w.bits = 0;

  long long pos = 0;
  while (true) {
    long long bend = pos + FBLOCK < n ? pos + FBLOCK : n;
    int last = bend == n;
    // tokenize [pos, bend)
    long long ntok = 0;
    long long s = pos;
    if (bend - pos >= 16) {
      long long limit = bend - 12;
      while (s < limit) {
        uint32_t v = fld32(src + s);
        uint32_t h = fhash(v, FHB);
        long long c = table[h];
        table[h] = (int32_t)s;
        if (c >= 0 && s - c <= 32768 &&
            (fld32(src + c) & 0xFFFFFF) == (v & 0xFFFFFF)) {
          long long m = 3;
          long long maxm = bend - s;
          if (maxm > 258) maxm = 258;
          while (m + 8 <= maxm) {
            uint64_t x = fld64(src + c + m) ^ fld64(src + s + m);
            if (x) { m += __builtin_ctzll(x) >> 3; goto fext; }
            m += 8;
          }
          while (m < maxm && src[c + m] == src[s + m]) m++;
        fext:
          if (m > maxm) m = maxm;
          toks[ntok].val = (uint16_t)m;
          toks[ntok].dist = (uint16_t)(s - c);
          ntok++;
          // insert a few positions inside the match
          if (m > 2 && s + m + 8 < bend) {
            uint32_t v2 = fld32(src + s + 1);
            table[fhash(v2, FHB)] = (int32_t)(s + 1);
            uint32_t v3 = fld32(src + s + m - 2);
            table[fhash(v3, FHB)] = (int32_t)(s + m - 2);
          }
          s += m;
        } else {
          toks[ntok].val = src[s];
          toks[ntok].dist = 0;
          ntok++;
          s++;
        }
      }
    }
    while (s < bend) {
      toks[ntok].val = src[s];
      toks[ntok].dist = 0;
      ntok++;
      s++;
    }

    // histograms (lit/len 286 incl. EOB, dist 30)
    uint32_t h_lit[288] = {0}, h_dst[32] = {0};
    for (long long i = 0; i < ntok; i++) {
      if (toks[i].dist == 0) {
        h_lit[toks[i].val]++;
      } else {
        h_lit[257 + len_code(toks[i].val)]++;
        h_dst[dst_code(toks[i].dist)]++;
      }
    }
    h_lit[256]++;  // EOB
    uint8_t l_lit[288] = {0}, l_dst[32] = {0};
    uint16_t c_lit[288], c_dst[32];
    bool okl = build_lengths(h_lit, 286, 15, l_lit);
    bool okd = build_lengths(h_dst, 30, 15, l_dst);
    if (okd) {
      // RFC: at least one dist code must be described; if none used,
      // build_lengths with all-zero hist returned false
    } else {
      l_dst[0] = 1;
      l_dst[1] = 1;  // two dummy dist codes (legal: unused)
      okd = true;
    }
    long long block_start = w.n;
    int start_bits = w.bits;
    bool wrote = false;
    if (okl) {
      canon_codes(l_lit, 286, c_lit);
      canon_codes(l_dst, 30, c_dst);
      // code-length sequence: l_lit[0..hlit) + l_dst[0..hdist)
      int hlit = 286;
      while (hlit > 257 && l_lit[hlit - 1] == 0) hlit--;
      int hdist = 30;
      while (hdist > 1 && l_dst[hdist - 1] == 0) hdist--;
      uint8_t seq[320];
      int ns = 0;
      for (int i = 0; i < hlit; i++) seq[ns++] = l_lit[i];
      for (int i = 0; i < hdist; i++) seq[ns++] = l_dst[i];
      // RLE the sequence into CL symbols
      uint8_t cls[320];
      uint8_t clx[320];
      int ncl = 0;
      uint32_t h_cl[19] = {0};
      for (int i = 0; i < ns;) {
        int v = seq[i];
        int run = 1;
        while (i + run < ns && seq[i + run] == v) run++;
        if (v == 0) {
          int r = run;
          while (r >= 11) {
            int take = r > 138 ? 138 : r;
            cls[ncl] = 18; clx[ncl++] = (uint8_t)(take - 11);
            h_cl[18]++; r -= take;
          }
          if (r >= 3) {
            cls[ncl] = 17; clx[ncl++] = (uint8_t)(r - 3);
            h_cl[17]++; r = 0;
          }
          while (r-- > 0) { cls[ncl] = 0; clx[ncl++] = 0; h_cl[0]++; }
        } else {
          cls[ncl] = (uint8_t)v; clx[ncl++] = 0; h_cl[v]++;
          int r = run - 1;
          while (r >= 3) {
            int take = r > 6 ? 6 : r;
            cls[ncl] = 16; clx[ncl++] = (uint8_t)(take - 3);
            h_cl[16]++; r -= take;
          }
          while (r-- > 0) { cls[ncl] = (uint8_t)v; clx[ncl++] = 0; h_cl[v]++; }
        }
        i += run;
      }
      uint8_t l_cl[19];
      uint16_t c_cl[19];
      if (build_lengths(h_cl, 19, 7, l_cl)) {
        canon_codes(l_cl, 19, c_cl);
        static const uint8_t ORD[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                        11, 4, 12, 3, 13, 2, 14, 1, 15};
        int hclen = 19;
        while (hclen > 4 && l_cl[ORD[hclen - 1]] == 0) hclen--;
        fw_bits(&w, last ? 1 : 0, 1);
        fw_bits(&w, 2, 2);  // dynamic
        fw_bits(&w, hlit - 257, 5);
        fw_bits(&w, hdist - 1, 5);
        fw_bits(&w, hclen - 4, 4);
        for (int i = 0; i < hclen; i++) fw_bits(&w, l_cl[ORD[i]], 3);
        for (int i = 0; i < ncl; i++) {
          fw_bits(&w, c_cl[cls[i]], l_cl[cls[i]]);
          if (cls[i] == 16) fw_bits(&w, clx[i], 2);
          else if (cls[i] == 17) fw_bits(&w, clx[i], 3);
          else if (cls[i] == 18) fw_bits(&w, clx[i], 7);
        }
        for (long long i = 0; i < ntok; i++) {
          if (toks[i].dist == 0) {
            fw_bits(&w, c_lit[toks[i].val], l_lit[toks[i].val]);
          } else {
            int lc = len_code(toks[i].val);
            fw_bits(&w, c_lit[257 + lc], l_lit[257 + lc]);
            fw_bits(&w, toks[i].val - LEN_BASE[lc], LEN_XB[lc]);
            int dc = dst_code(toks[i].dist);
            fw_bits(&w, c_dst[dc], l_dst[dc]);
            fw_bits(&w, toks[i].dist - DST_BASE[dc], DST_XB[dc]);
          }
        }
        fw_bits(&w, c_lit[256], l_lit[256]);  // EOB
        wrote = true;
      }
    }
    if (!wrote) {
      // stored block
      fw_bits(&w, last ? 1 : 0, 1);
      fw_bits(&w, 0, 2);
      fw_align(&w);
      long long len = bend - pos;
      dst[w.n++] = (uint8_t)len;
      dst[w.n++] = (uint8_t)(len >> 8);
      dst[w.n++] = (uint8_t)~len;
      dst[w.n++] = (uint8_t)(~len >> 8);
      memcpy(dst + w.n, src + pos, len);
      w.n += len;
    }
    (void)block_start;
    (void)start_bits;
    if (w.n + FBLOCK + 64 > cap && bend < n) {
      free(table);
      free(toks);
      return -1;
    }
    pos = bend;
    if (last) break;
  }
  fw_align(&w);
  free(table);
  free(toks);
  return w.n;
}

// ---------------------------------------------------------------------------
// inflate
// ---------------------------------------------------------------------------

struct FBr {
  const uint8_t* p;
  long long n;
  long long bit;
};
static inline uint32_t fbr_peek(FBr* b, int nb) {
  long long byte = b->bit >> 3;
  uint64_t v = 0;
  // padded input (wrapper adds slack)
  memcpy(&v, b->p + byte, 8);
  return (uint32_t)((v >> (b->bit & 7)) & ((1u << nb) - 1));
}
static inline uint32_t fbr_get(FBr* b, int nb) {
  uint32_t v = fbr_peek(b, nb);
  b->bit += nb;
  return v;
}

struct HufD {
  int16_t sym[1 << 15];
  uint8_t len[1 << 15];
  int maxlen;
};

static bool hufd_build(HufD* t, const uint8_t* lens, int nsym) {
  int bl[16] = {0};
  int maxlen = 0;
  for (int s = 0; s < nsym; s++) {
    bl[lens[s]]++;
    if (lens[s] > maxlen) maxlen = lens[s];
  }
  if (maxlen == 0) return false;
  t->maxlen = maxlen;
  bl[0] = 0;
  uint32_t code = 0;
  uint32_t next[16];
  long long avail = 1;
  for (int b = 1; b <= maxlen; b++) {
    avail = (avail << 1) - bl[b];
    if (avail < 0) return false;
    code = (code + bl[b - 1]) << 1;
    next[b] = code;
  }
  int size = 1 << maxlen;
  memset(t->len, 0, size);
  for (int s = 0; s < nsym; s++) {
    int L = lens[s];
    if (!L) continue;
    uint32_t c = next[L]++;
    uint32_t rc = bitrev(c, L);
    for (uint32_t f = rc; f < (uint32_t)size; f += (1u << L)) {
      t->sym[f] = (int16_t)s;
      t->len[f] = (uint8_t)L;
    }
  }
  return true;
}

static inline int hufd_read(const HufD* t, FBr* b) {
  uint32_t idx = fbr_peek(b, t->maxlen);
  if (!t->len[idx]) return -1;
  b->bit += t->len[idx];
  return t->sym[idx];
}

long long ct_inflate(const uint8_t* src, long long n, uint8_t* dst,
                     long long cap) {
  FBr br;
  br.p = src;
  br.n = n;
  br.bit = 0;
  HufD* lit_t = (HufD*)malloc(sizeof(HufD));
  HufD* dst_t = (HufD*)malloc(sizeof(HufD));
  if (!lit_t || !dst_t) {
    free(lit_t);
    free(dst_t);
    return -1;
  }
  long long d = 0;
  while (true) {
    if ((br.bit >> 3) >= n) { d = -1; break; }
    int final = fbr_get(&br, 1);
    int btype = fbr_get(&br, 2);
    if (btype == 0) {
      br.bit = (br.bit + 7) & ~7ll;
      long long byte = br.bit >> 3;
      if (byte + 4 > n) { d = -1; break; }
      int len = src[byte] | (src[byte + 1] << 8);
      int nlen = src[byte + 2] | (src[byte + 3] << 8);
      if ((len ^ 0xFFFF) != nlen || byte + 4 + len > n || d + len > cap) {
        d = -1;
        break;
      }
      memcpy(dst + d, src + byte + 4, len);
      d += len;
      br.bit = (byte + 4 + len) * 8;
    } else if (btype == 1 || btype == 2) {
      uint8_t ll[288], dl[32];
      if (btype == 1) {
        for (int i = 0; i < 144; i++) ll[i] = 8;
        for (int i = 144; i < 256; i++) ll[i] = 9;
        for (int i = 256; i < 280; i++) ll[i] = 7;
        for (int i = 280; i < 288; i++) ll[i] = 8;
        for (int i = 0; i < 30; i++) dl[i] = 5;
        if (!hufd_build(lit_t, ll, 288) || !hufd_build(dst_t, dl, 30)) {
          d = -1;
          break;
        }
      } else {
        int hlit = fbr_get(&br, 5) + 257;
        int hdist = fbr_get(&br, 5) + 1;
        int hclen = fbr_get(&br, 4) + 4;
        static const uint8_t ORD[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                        11, 4, 12, 3, 13, 2, 14, 1, 15};
        uint8_t cl[19] = {0};
        for (int i = 0; i < hclen; i++) cl[ORD[i]] = (uint8_t)fbr_get(&br, 3);
        HufD* cl_t = (HufD*)malloc(sizeof(HufD));
        if (!cl_t || !hufd_build(cl_t, cl, 19)) {
          free(cl_t);
          d = -1;
          break;
        }
        uint8_t seq[320];
        int ns = 0;
        int want = hlit + hdist;
        while (ns < want) {
          int s = hufd_read(cl_t, &br);
          if (s < 0) { ns = -1; break; }
          if (s < 16) {
            seq[ns++] = (uint8_t)s;
          } else if (s == 16) {
            if (ns == 0) { ns = -1; break; }
            int r = fbr_get(&br, 2) + 3;
            uint8_t v = seq[ns - 1];
            while (r-- && ns < want) seq[ns++] = v;
          } else if (s == 17) {
            int r = fbr_get(&br, 3) + 3;
            while (r-- && ns < want) seq[ns++] = 0;
          } else {
            int r = fbr_get(&br, 7) + 11;
            while (r-- && ns < want) seq[ns++] = 0;
          }
        }
        free(cl_t);
        if (ns != want) { d = -1; break; }
        memcpy(ll, seq, hlit);
        memset(ll + hlit, 0, sizeof(ll) - hlit);
        memcpy(dl, seq + hlit, hdist);
        memset(dl + hdist, 0, sizeof(dl) - hdist);
        if (!hufd_build(lit_t, ll, 288)) { d = -1; break; }
        if (!hufd_build(dst_t, dl, 30)) {
          // all-zero dist lengths are legal when no matches occur
          dst_t->maxlen = 1;
          memset(dst_t->len, 0, 2);
        }
      }
      while (true) {
        if (br.bit > 8 * n) { d = -1; goto out; }
        int s = hufd_read(lit_t, &br);
        if (s < 0) { d = -1; goto out; }
        if (s < 256) {
          if (d >= cap) { d = -1; goto out; }
          dst[d++] = (uint8_t)s;
        } else if (s == 256) {
          break;
        } else {
          int lc = s - 257;
          if (lc > 28) { d = -1; goto out; }
          int len = LEN_BASE[lc] + (int)fbr_get(&br, LEN_XB[lc]);
          int ds = hufd_read(dst_t, &br);
          if (ds < 0 || ds > 29) { d = -1; goto out; }
          int dist = DST_BASE[ds] + (int)fbr_get(&br, DST_XB[ds]);
          if (dist > d || d + len > cap) { d = -1; goto out; }
          if (dist >= len) {
            memcpy(dst + d, dst + d - dist, len);
            d += len;
          } else {
            for (int k = 0; k < len; k++) { dst[d] = dst[d - dist]; d++; }
          }
        }
      }
    } else {
      d = -1;
      break;
    }
    if (final) {
      if (br.bit > 8 * n) d = -1;  // consumed past the real input
      break;
    }
  }
out:
  free(lit_t);
  free(dst_t);
  return d;
}

}  // extern "C"
