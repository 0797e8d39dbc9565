// tapstark native commit engine.
//
// The TPU-native equivalent of the runtime-native work the reference does in
// Rust (taptree assembly + hashing, Winternitz chains; reference
// basic/src/tcs/, scripts/src/bit_comm/). Exposed as a C ABI for ctypes:
//   - winternitz_pubkeys_batch: hash160 chains for bit-commitment keys
//   - tcs_commit: bulk leaf-script assembly, tapleaf hashing, ordered
//     taptree build with per-leaf merkle branches
//
// Self-contained SHA-256 / RIPEMD-160 (no external deps).

#include <cstdint>
#include <cstring>
#include <vector>

#if defined(__SHA__) && defined(__SSE4_1__)
#define TAPSTARK_SHA_NI 1
#include <immintrin.h>
#endif

// ---------------------------------------------------------------------------
// SHA-256
// ---------------------------------------------------------------------------

namespace sha256impl {

static const uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

#ifdef TAPSTARK_SHA_NI
// SHA-NI one-block compression (ABEF/CDGH register packing, canonical
// round/message-schedule interleaving).
static void block_ni(uint32_t h[8], const uint8_t* p) {
  const __m128i MASK =
      _mm_set_epi64x(0x0c0d0e0f08090a0bULL, 0x0405060700010203ULL);
  __m128i tmp = _mm_loadu_si128((const __m128i*)&h[0]);
  __m128i st1 = _mm_loadu_si128((const __m128i*)&h[4]);
  tmp = _mm_shuffle_epi32(tmp, 0xB1);       // CDAB
  st1 = _mm_shuffle_epi32(st1, 0x1B);       // EFGH
  __m128i st0 = _mm_alignr_epi8(tmp, st1, 8);  // ABEF
  st1 = _mm_blend_epi16(st1, tmp, 0xF0);    // CDGH
  const __m128i abef_save = st0, cdgh_save = st1;

  __m128i m[4];
  m[0] = _mm_shuffle_epi8(_mm_loadu_si128((const __m128i*)(p + 0)), MASK);
  m[1] = _mm_shuffle_epi8(_mm_loadu_si128((const __m128i*)(p + 16)), MASK);
  m[2] = _mm_shuffle_epi8(_mm_loadu_si128((const __m128i*)(p + 32)), MASK);
  m[3] = _mm_shuffle_epi8(_mm_loadu_si128((const __m128i*)(p + 48)), MASK);

  for (int g = 0; g < 16; g++) {
    __m128i wk =
        _mm_add_epi32(m[g & 3], _mm_loadu_si128((const __m128i*)&K[4 * g]));
    st1 = _mm_sha256rnds2_epu32(st1, st0, wk);
    wk = _mm_shuffle_epi32(wk, 0x0E);
    st0 = _mm_sha256rnds2_epu32(st0, st1, wk);
    if (g >= 1 && g <= 2) {
      m[g - 1] = _mm_sha256msg1_epu32(m[g - 1], m[g]);
    } else if (g >= 3 && g <= 14) {
      int cur = g & 3, prv = (g + 3) & 3, nxt = (g + 1) & 3;
      __m128i t = _mm_alignr_epi8(m[cur], m[prv], 4);
      m[nxt] = _mm_sha256msg2_epu32(_mm_add_epi32(m[nxt], t), m[cur]);
      m[prv] = _mm_sha256msg1_epu32(m[prv], m[cur]);
    }
  }

  st0 = _mm_add_epi32(st0, abef_save);
  st1 = _mm_add_epi32(st1, cdgh_save);

  tmp = _mm_shuffle_epi32(st0, 0x1B);       // FEBA
  st1 = _mm_shuffle_epi32(st1, 0xB1);       // DCHG
  st0 = _mm_blend_epi16(tmp, st1, 0xF0);    // DCBA
  st1 = _mm_alignr_epi8(st1, tmp, 8);       // HGFE
  _mm_storeu_si128((__m128i*)&h[0], st0);
  _mm_storeu_si128((__m128i*)&h[4], st1);
}
#endif  // TAPSTARK_SHA_NI

struct Ctx {
  uint32_t h[8];
  uint64_t len = 0;
  uint8_t buf[64];
  size_t buflen = 0;

  Ctx() {
    static const uint32_t init[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                     0xa54ff53a, 0x510e527f, 0x9b05688c,
                                     0x1f83d9ab, 0x5be0cd19};
    memcpy(h, init, sizeof(h));
  }

  void block(const uint8_t* p) {
#ifdef TAPSTARK_SHA_NI
    block_ni(h, p);
    return;
#endif
    block_generic(p);
  }

  void block_generic(const uint8_t* p) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
      w[i] = (uint32_t(p[4 * i]) << 24) | (uint32_t(p[4 * i + 1]) << 16) |
             (uint32_t(p[4 * i + 2]) << 8) | uint32_t(p[4 * i + 3]);
    for (int i = 16; i < 64; i++) {
      uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
      uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 64; i++) {
      uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
      uint32_t ch = (e & f) ^ (~e & g);
      uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
      uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint32_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }

  void update(const uint8_t* p, size_t n) {
    len += n;
    if (buflen) {
      size_t take = 64 - buflen;
      if (take > n) take = n;
      memcpy(buf + buflen, p, take);
      buflen += take;
      p += take;
      n -= take;
      if (buflen == 64) { block(buf); buflen = 0; }
    }
    while (n >= 64) { block(p); p += 64; n -= 64; }
    if (n) { memcpy(buf, p, n); buflen = n; }
  }

  void final(uint8_t out[32]) {
    uint64_t bits = len * 8;
    uint8_t pad = 0x80;
    update(&pad, 1);
    uint8_t z = 0;
    while (buflen != 56) update(&z, 1);
    uint8_t lb[8];
    for (int i = 0; i < 8; i++) lb[i] = uint8_t(bits >> (56 - 8 * i));
    update(lb, 8);
    for (int i = 0; i < 8; i++) {
      out[4 * i] = uint8_t(h[i] >> 24);
      out[4 * i + 1] = uint8_t(h[i] >> 16);
      out[4 * i + 2] = uint8_t(h[i] >> 8);
      out[4 * i + 3] = uint8_t(h[i]);
    }
  }
};

static void hash(const uint8_t* p, size_t n, uint8_t out[32]) {
  Ctx c;
  c.update(p, n);
  c.final(out);
}

}  // namespace sha256impl

// ---------------------------------------------------------------------------
// RIPEMD-160
// ---------------------------------------------------------------------------

namespace rmd160impl {

static inline uint32_t rol(uint32_t x, int n) {
  return (x << n) | (x >> (32 - n));
}

static const int ML[80] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13};
static const int MR[80] = {
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11};
static const int RL[80] = {
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6};
static const int RR[80] = {
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11};
static const uint32_t KL[5] = {0, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc,
                               0xa953fd4e};
static const uint32_t KR[5] = {0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9,
                               0};

static inline uint32_t fi(uint32_t x, uint32_t y, uint32_t z, int i) {
  switch (i) {
    case 0: return x ^ y ^ z;
    case 1: return (x & y) | (~x & z);
    case 2: return (x | ~y) ^ z;
    case 3: return (x & z) | (y & ~z);
    default: return x ^ (y | ~z);
  }
}

static void compress(uint32_t h[5], const uint8_t* blk) {
  uint32_t x[16];
  for (int i = 0; i < 16; i++)
    x[i] = uint32_t(blk[4 * i]) | (uint32_t(blk[4 * i + 1]) << 8) |
           (uint32_t(blk[4 * i + 2]) << 16) | (uint32_t(blk[4 * i + 3]) << 24);
  uint32_t al = h[0], bl = h[1], cl = h[2], dl = h[3], el = h[4];
  uint32_t ar = h[0], br = h[1], cr = h[2], dr = h[3], er = h[4];
  for (int i = 0; i < 80; i++) {
    int rnd = i >> 4;
    uint32_t t = rol(al + fi(bl, cl, dl, rnd) + x[ML[i]] + KL[rnd], RL[i]) + el;
    al = el; el = dl; dl = rol(cl, 10); cl = bl; bl = t;
    t = rol(ar + fi(br, cr, dr, 4 - rnd) + x[MR[i]] + KR[rnd], RR[i]) + er;
    ar = er; er = dr; dr = rol(cr, 10); cr = br; br = t;
  }
  uint32_t t = h[1] + cl + dr;
  h[1] = h[2] + dl + er;
  h[2] = h[3] + el + ar;
  h[3] = h[4] + al + br;
  h[4] = h[0] + bl + cr;
  h[0] = t;
}

static void hash(const uint8_t* p, size_t n, uint8_t out[20]) {
  uint32_t h[5] = {0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476, 0xc3d2e1f0};
  size_t full = n & ~size_t(63);
  for (size_t off = 0; off < full; off += 64) compress(h, p + off);
  uint8_t tail[128];
  size_t rem = n - full;
  memcpy(tail, p + full, rem);
  tail[rem] = 0x80;
  size_t padlen = (rem < 56) ? 64 : 128;
  memset(tail + rem + 1, 0, padlen - rem - 1 - 8);
  uint64_t bits = uint64_t(n) * 8;
  for (int i = 0; i < 8; i++) tail[padlen - 8 + i] = uint8_t(bits >> (8 * i));
  compress(h, tail);
  if (padlen == 128) compress(h, tail + 64);
  for (int i = 0; i < 5; i++) {
    out[4 * i] = uint8_t(h[i]);
    out[4 * i + 1] = uint8_t(h[i] >> 8);
    out[4 * i + 2] = uint8_t(h[i] >> 16);
    out[4 * i + 3] = uint8_t(h[i] >> 24);
  }
}

}  // namespace rmd160impl

static void hash160(const uint8_t* p, size_t n, uint8_t out[20]) {
  uint8_t s[32];
  sha256impl::hash(p, n, s);
  rmd160impl::hash(s, 32, out);
}

// ---------------------------------------------------------------------------
// Script helpers
// ---------------------------------------------------------------------------

// minimal CScriptNum push of a non-negative value < 2^31 (incl. opcode)
static size_t push_num(uint8_t* out, uint32_t v) {
  if (v == 0) { out[0] = 0x00; return 1; }          // OP_0
  if (v <= 16) { out[0] = 0x50 + uint8_t(v); return 1; }  // OP_1..OP_16
  uint8_t enc[5];
  size_t n = 0;
  uint32_t m = v;
  while (m) { enc[n++] = uint8_t(m & 0xff); m >>= 8; }
  if (enc[n - 1] & 0x80) enc[n++] = 0x00;
  out[0] = uint8_t(n);
  memcpy(out + 1, enc, n);
  return n + 1;
}

static void tagged_hash(const uint8_t tagdigest[32], const uint8_t* msg,
                        size_t n, uint8_t out[32]) {
  sha256impl::Ctx c;
  c.update(tagdigest, 32);
  c.update(tagdigest, 32);
  c.update(msg, n);
  c.final(out);
}

extern "C" {

// hash160 chains for Winternitz public keys.
// secrets: n * secret_len bytes; for each secret and each digit index
// 0..num_digits-1: h = hash160(secret || digit); repeat chain_extra more
// times; output n * num_digits * 20 bytes.
void winternitz_pubkeys_batch(const uint8_t* secrets, size_t n,
                              size_t secret_len, int num_digits,
                              int chain_extra, uint8_t* out) {
  std::vector<uint8_t> buf(secret_len + 1);
  for (size_t i = 0; i < n; i++) {
    memcpy(buf.data(), secrets + i * secret_len, secret_len);
    for (int d = 0; d < num_digits; d++) {
      buf[secret_len] = uint8_t(d);
      uint8_t h[20];
      hash160(buf.data(), secret_len + 1, h);
      for (int k = 0; k < chain_extra; k++) hash160(h, 20, h);
      memcpy(out + (i * num_digits + d) * 20, h, 20);
    }
  }
}

void sha256_batch(const uint8_t* data, const uint64_t* offsets, size_t n,
                  uint8_t* out) {
  for (size_t i = 0; i < n; i++)
    sha256impl::hash(data + offsets[i], offsets[i + 1] - offsets[i],
                     out + 32 * i);
}

// TCS commit: assemble every leaf script, hash tapleaves, build the ordered
// taptree, and emit per-leaf merkle branches + the logical->physical
// permutation.
//
// Leaf i script = index_lock || push(i) || OP_EQUALVERIFY ||
//   for each value v (num_values): eval_lock[v] || for limb in
//     reversed(limbs): push(value) || OP_EQUALVERIFY || ... || OP_1
//
// values: num_leaves * num_values * num_limbs u32 (canonical)
// tapleaf_tag / tapbranch_tag: 32-byte sha256 digests of the tag strings
// leaf_version: 0xc0
// outputs: leaf_hashes (num_leaves*32), root (32),
//          branches (num_leaves * depth * 32), perm (num_leaves u32:
//          logical -> physical)
void tcs_commit(const uint8_t* index_lock, uint64_t index_lock_len,
                const uint8_t* eval_locks, const uint64_t* eval_lock_offsets,
                uint32_t num_values, const uint32_t* values,
                uint32_t num_leaves, uint32_t num_limbs,
                const uint8_t* tapleaf_tag, const uint8_t* tapbranch_tag,
                uint8_t leaf_version, uint8_t* leaf_hashes, uint8_t* root,
                uint8_t* branches, uint32_t* perm) {
  // depth
  int depth = 0;
  while ((1u << depth) < num_leaves) depth++;

  // assemble + hash leaves
  size_t max_script = index_lock_len + 6 +
                      (eval_lock_offsets[num_values] -
                       eval_lock_offsets[0]) +
                      size_t(num_values) * num_limbs * 7 + 8;
  std::vector<uint8_t> script(max_script);
  for (uint32_t i = 0; i < num_leaves; i++) {
    size_t off = 0;
    memcpy(script.data(), index_lock, index_lock_len);
    off += index_lock_len;
    off += push_num(script.data() + off, i);
    script[off++] = 0x88;  // OP_EQUALVERIFY
    const uint32_t* row = values + size_t(i) * num_values * num_limbs;
    for (uint32_t v = 0; v < num_values; v++) {
      uint64_t l0 = eval_lock_offsets[v], l1 = eval_lock_offsets[v + 1];
      memcpy(script.data() + off, eval_locks + l0, l1 - l0);
      off += l1 - l0;
      for (int limb = int(num_limbs) - 1; limb >= 0; limb--) {
        off += push_num(script.data() + off, row[v * num_limbs + limb]);
        script[off++] = 0x88;
      }
    }
    script[off++] = 0x51;  // OP_1
    // tapleaf hash: tagged(tag, version || compact_size(len) || script)
    sha256impl::Ctx c;
    c.update(tapleaf_tag, 32);
    c.update(tapleaf_tag, 32);
    uint8_t hdr[8];
    size_t hn = 0;
    hdr[hn++] = leaf_version;
    if (off < 0xfd) {
      hdr[hn++] = uint8_t(off);
    } else if (off <= 0xffff) {
      hdr[hn++] = 0xfd;
      hdr[hn++] = uint8_t(off & 0xff);
      hdr[hn++] = uint8_t(off >> 8);
    } else {
      hdr[hn++] = 0xfe;
      for (int b = 0; b < 4; b++) hdr[hn++] = uint8_t(off >> (8 * b));
    }
    c.update(hdr, hn);
    c.update(script.data(), off);
    c.final(leaf_hashes + 32 * i);
  }

  // tree build with ordered combination
  std::vector<uint8_t> level(size_t(num_leaves) * 32);
  memcpy(level.data(), leaf_hashes, size_t(num_leaves) * 32);
  std::vector<uint32_t> order(num_leaves);  // physical pos -> leaf id
  for (uint32_t i = 0; i < num_leaves; i++) order[i] = i;

  uint32_t count = num_leaves;
  int lvl = 0;
  std::vector<uint8_t> next;
  while (count > 1) {
    next.assign(size_t(count / 2) * 32, 0);
    uint32_t block = 1u << lvl;  // leaves per node
    for (uint32_t k = 0; k + 1 < count; k += 2) {
      const uint8_t* ha = level.data() + size_t(k) * 32;
      const uint8_t* hb = level.data() + size_t(k + 1) * 32;
      // branches: node a's leaves get hb, node b's leaves get ha
      for (uint32_t j = 0; j < block; j++) {
        uint32_t la = order[k * block + j];
        uint32_t lb = order[(k + 1) * block + j];
        memcpy(branches + (size_t(la) * depth + lvl) * 32, hb, 32);
        memcpy(branches + (size_t(lb) * depth + lvl) * 32, ha, 32);
      }
      bool left_first = memcmp(ha, hb, 32) <= 0;
      // parent = tagged(TapBranch, min || max)
      sha256impl::Ctx c;
      c.update(tapbranch_tag, 32);
      c.update(tapbranch_tag, 32);
      if (left_first) {
        c.update(ha, 32);
        c.update(hb, 32);
      } else {
        c.update(hb, 32);
        c.update(ha, 32);
      }
      c.final(next.data() + size_t(k / 2) * 32);
      if (!left_first) {
        // swap the physical leaf ranges of a and b
        for (uint32_t j = 0; j < block; j++) {
          uint32_t tmp = order[k * block + j];
          order[k * block + j] = order[(k + 1) * block + j];
          order[(k + 1) * block + j] = tmp;
        }
      }
    }
    level.swap(next);
    count /= 2;
    lvl++;
  }
  memcpy(root, level.data(), 32);
  // perm: logical leaf id -> physical position
  for (uint32_t pos = 0; pos < num_leaves; pos++) perm[order[pos]] = pos;
}

}  // extern "C"
