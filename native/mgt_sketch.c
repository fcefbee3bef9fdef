/* Symmetric (w,k)-minimizer sketching, semantics-equal to the reference
 * (sketch.c:56-109): canonical k-mers via an invertible 64-bit hash,
 * symmetric k-mers skipped, ties all emitted, output sorted by position.
 * Emits packed records x = hash<<8 | span, y = rid<<32 | last_pos<<1 | strand.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

static uint8_t nt4[256];
static int nt4_ready = 0;

static void nt4_init(void)
{
    int i;
    for (i = 0; i < 256; ++i) nt4[i] = 4;
    nt4[0] = 0; nt4[1] = 1; nt4[2] = 2; nt4[3] = 3;
    nt4['A'] = nt4['a'] = 0;
    nt4['C'] = nt4['c'] = 1;
    nt4['G'] = nt4['g'] = 2;
    nt4['T'] = nt4['t'] = 3;
    nt4['U'] = nt4['u'] = 3;
    nt4_ready = 1;
}

static inline uint64_t mgt_hash64(uint64_t key, uint64_t mask)
{
    key = (~key + (key << 21)) & mask;
    key = key ^ key >> 24;
    key = ((key + (key << 3)) + (key << 8)) & mask;
    key = key ^ key >> 14;
    key = ((key + (key << 2)) + (key << 4)) & mask;
    key = key ^ key >> 28;
    key = (key + (key << 31)) & mask;
    return key;
}

typedef struct { uint64_t x, y; } mm_t;

/* out holds cap records of 2 uint64; returns #records or -1 on overflow */
int64_t mgt_sketch(const uint8_t *seq, int64_t len, int w, int k,
                   uint32_t rid, uint64_t *out, int64_t cap)
{
    uint64_t shift1 = 2 * (k - 1), mask = (1ULL << (2 * k)) - 1;
    uint64_t kmer_f = 0, kmer_r = 0;
    mm_t buf[256], minv = { UINT64_MAX, UINT64_MAX };
    int64_t i, n = 0;
    int j, l = 0, buf_pos = 0, min_pos = 0, kmer_span = 0;

    if (!nt4_ready) nt4_init();
    if (len <= 0 || w <= 0 || w >= 256 || k <= 0 || k > 28) return 0;
    memset(buf, 0xff, w * sizeof(mm_t));

#define EMIT(rec) do { \
        if (n >= cap) return -1; \
        out[2 * n] = (rec).x; out[2 * n + 1] = (rec).y; ++n; \
    } while (0)

    for (i = 0; i < len; ++i) {
        int c = nt4[seq[i]];
        mm_t info = { UINT64_MAX, UINT64_MAX };
        if (c < 4) {
            int z;
            kmer_span = l + 1 < k ? l + 1 : k;
            kmer_f = (kmer_f << 2 | (uint64_t)c) & mask;
            kmer_r = (kmer_r >> 2) | ((uint64_t)(3 ^ c) << shift1);
            if (kmer_f == kmer_r) continue;      /* strand-ambiguous k-mer */
            z = kmer_f < kmer_r ? 0 : 1;
            ++l;
            if (l >= k && kmer_span < 256) {
                info.x = mgt_hash64(z ? kmer_r : kmer_f, mask) << 8 | (uint64_t)kmer_span;
                info.y = (uint64_t)rid << 32 | (uint64_t)((uint32_t)i << 1 | z);
            }
        } else l = 0, kmer_span = 0;
        buf[buf_pos] = info;
        if (l == w + k - 1 && minv.x != UINT64_MAX) { /* first full window: ties */
            for (j = buf_pos + 1; j < w; ++j)
                if (minv.x == buf[j].x && buf[j].y != minv.y) EMIT(buf[j]);
            for (j = 0; j < buf_pos; ++j)
                if (minv.x == buf[j].x && buf[j].y != minv.y) EMIT(buf[j]);
        }
        if (info.x <= minv.x) {
            if (l >= w + k && minv.x != UINT64_MAX) EMIT(minv);
            minv = info, min_pos = buf_pos;
        } else if (buf_pos == min_pos) {        /* old min left the window */
            if (l >= w + k - 1 && minv.x != UINT64_MAX) EMIT(minv);
            minv.x = UINT64_MAX;
            for (j = buf_pos + 1; j < w; ++j)
                if (minv.x >= buf[j].x) minv = buf[j], min_pos = j;
            for (j = 0; j <= buf_pos; ++j)
                if (minv.x >= buf[j].x) minv = buf[j], min_pos = j;
            if (l >= w + k - 1 && minv.x != UINT64_MAX) { /* emit ties */
                for (j = buf_pos + 1; j < w; ++j)
                    if (minv.x == buf[j].x && minv.y != buf[j].y) EMIT(buf[j]);
                for (j = 0; j <= buf_pos; ++j)
                    if (minv.x == buf[j].x && minv.y != buf[j].y) EMIT(buf[j]);
            }
        }
        if (++buf_pos == w) buf_pos = 0;
    }
    if (minv.x != UINT64_MAX) EMIT(minv);
#undef EMIT
    return n;
}
