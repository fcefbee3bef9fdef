/* Sanitizer self-test driver for the native host engines.
 *
 * The reference ships `make asan=1` (Makefile:12-15) as its memory-
 * safety harness; this is the analog for native/*.c: a standalone C
 * binary that fuzzes the sort, sketch, chaining, finish, WFA and ds
 * engines with adversarial sizes, built with -fsanitize=address (see
 * tests/test_native_engines.py::test_asan_selftest).  Exit 0 = no
 * leaks/overflows detected; any ASan report aborts non-zero.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int64_t mgt_sketch(const uint8_t *seq, int64_t len, int w, int k,
                   uint32_t rid, uint64_t *out, int64_t cap);
void mgt_radix_sort_128x(uint64_t *a, int64_t n);
void mgt_radix_argsort_u64(const uint64_t *keys, uint64_t *idx, int64_t n);
int64_t mgt_lchain_dp(int32_t max_dist_x, int32_t max_dist_y, int32_t bw,
                      int32_t max_skip, int32_t max_iter, int32_t min_cnt,
                      int32_t min_sc, float chn_pen_gap, float chn_pen_skip,
                      int32_t is_cdna, int32_t n_seg, int64_t n,
                      uint64_t *ax, uint64_t *ay, uint64_t *u_out,
                      int32_t *n_u_out);
int64_t mgt_lchain_finish(int32_t bw, int32_t is_cdna, int32_t min_cnt,
                          int32_t min_sc, int64_t n, const int32_t *f32v,
                          const int32_t *p32, uint64_t *ax, uint64_t *ay,
                          uint64_t *u_out, int32_t *n_u_out);
int32_t mgt_wfa_exact2(const char *ts0, int32_t tl, const char *qs0,
                       int32_t ql, int32_t px, int32_t po1, int32_t pe1,
                       int32_t po2, int32_t pe2, int32_t is_tb,
                       int32_t max_s, int64_t max_iter, int32_t step,
                       uint32_t **cigar_out, int32_t *n_cigar_out,
                       int64_t *n_iter_out);
void mgt_wfa_free(uint32_t *p);
void mgt_chain_filters(const uint64_t *ax, uint64_t *ay,
                       int32_t lc_max_occ, int32_t lc_max_trim,
                       int32_t score, int32_t bw, int32_t min_match,
                       int32_t max_gap_half,
                       int64_t *off_io, int64_t *cnt_io);
int64_t mgt_gen_ds(const uint32_t *cigar, int64_t n_cigar,
                   const uint8_t *tseq, int64_t aplen,
                   const uint8_t *qseq, int64_t qs, int64_t qe,
                   char *ds_out, int64_t ds_cap,
                   int64_t *off_out, int64_t off_cap, int64_t *n_off_out);

static uint64_t rs = 0x853c49e6748fea9bULL;
static uint64_t rnd(void)
{
    rs ^= rs << 13; rs ^= rs >> 7; rs ^= rs << 17;
    return rs;
}

static void rand_dna(uint8_t *s, int64_t n, int with_n)
{
    const char *al = "ACGTN";
    for (int64_t i = 0; i < n; ++i)
        s[i] = (uint8_t)al[rnd() % (with_n && (rnd() & 15) == 0 ? 5 : 4)];
}

int main(void)
{
    /* radix sorts */
    for (int t = 0; t < 200; ++t) {
        int64_t n = rnd() % 700;
        uint64_t *a = malloc(16 * (n ? n : 1));
        uint64_t *keys = malloc(8 * (n ? n : 1));
        uint64_t *idx = malloc(8 * (n ? n : 1));
        for (int64_t i = 0; i < n; ++i) {
            a[2 * i] = rnd() >> (rnd() % 40);
            a[2 * i + 1] = i;
            keys[i] = rnd() >> (rnd() % 48);
        }
        mgt_radix_sort_128x(a, n);
        for (int64_t i = 1; i < n; ++i)
            if (a[2 * i - 2] > a[2 * i]) return 10;
        mgt_radix_argsort_u64(keys, idx, n);
        free(a); free(keys); free(idx);
    }

    /* sketch with adversarial w/k and tandems */
    for (int t = 0; t < 200; ++t) {
        int64_t n = 1 + rnd() % 600;
        int w = 1 + (int)(rnd() % 20), k = 1 + (int)(rnd() % 24);
        uint8_t *s = malloc(n);
        rand_dna(s, n, 1);
        if (t % 3 == 0 && n > 60)
            for (int64_t i = 30; i < n; ++i) s[i] = s[i % 17];
        int64_t cap = 2 * n + 8;
        uint64_t *out = malloc(16 * cap);
        int64_t m = mgt_sketch(s, n, w, k, 7, out, cap);
        if (m < -1) return 11;   /* -1 = legitimate cap overflow */
        free(s); free(out);
    }

    /* chaining DP + finish */
    for (int t = 0; t < 100; ++t) {
        int64_t n = 1 + rnd() % 400;
        uint64_t *ax = malloc(8 * n), *ay = malloc(8 * n);
        uint64_t *u = malloc(8 * n);
        int32_t *f = malloc(4 * n), *p = malloc(4 * n), n_u;
        for (int64_t i = 0; i < n; ++i) {
            uint64_t rid = rnd() % 3, rev = rnd() & 1;
            ax[i] = rid << 33 | rev << 32 | (rnd() % 8000);
            ay[i] = (uint64_t)(15 + rnd() % 7) << 32 | (rnd() % 4000);
        }
        /* sort ax (pair sort needs interleaved pairs) */
        uint64_t *pairs = malloc(16 * n);
        for (int64_t i = 0; i < n; ++i)
            pairs[2 * i] = ax[i], pairs[2 * i + 1] = ay[i];
        mgt_radix_sort_128x(pairs, n);
        for (int64_t i = 0; i < n; ++i)
            ax[i] = pairs[2 * i], ay[i] = pairs[2 * i + 1];
        free(pairs);
        mgt_lchain_dp(5000, 5000, 100 + (int)(rnd() % 900),
                      (int)(rnd() % 8), 5 + (int)(rnd() % 50), 3, 40,
                      0.19f, 0.009f, 0, 1, n, ax, ay, u, &n_u);
        for (int64_t i = 0; i < n; ++i) {
            f[i] = (int32_t)(rnd() % 500);
            p[i] = i > 0 ? (int32_t)(rnd() % (i + 1)) - 1 : -1;
        }
        mgt_lchain_finish(500, 0, 3, 40, n, f, p, ax, ay, u, &n_u);
        free(ax); free(ay); free(u); free(f); free(p);
    }


    /* chain filters */
    for (int t = 0; t < 150; ++t) {
        int64_t n = 1 + rnd() % 250, i, off = 0, cnt;
        uint64_t *ax = malloc(8 * n), *ay = malloc(8 * n);
        int64_t tp = 0;
        for (i = 0; i < n; ++i) {
            tp += 1 + rnd() % 120;
            ax[i] = (uint64_t)tp;
            ay[i] = (uint64_t)(1 + rnd() % 20) << 56
                | (uint64_t)(15 + rnd() % 7) << 32
                | (uint32_t)(tp + (int64_t)(rnd() % 800) - 400);
        }
        cnt = n;
        mgt_chain_filters(ax, ay, 8, 12, (int32_t)(40 + rnd() % 2000),
                          500, 100, 2500, &off, &cnt);
        free(ax); free(ay);
    }

    /* WFA exact + segmented + ds generation */
    for (int t = 0; t < 60; ++t) {
        int64_t tl = rnd() % 300, ql = 1 + rnd() % 300;
        uint8_t *ts = malloc(tl ? tl : 1), *qs = malloc(ql);
        rand_dna(ts, tl, 0);
        rand_dna(qs, ql, 0);
        if (t & 1)   /* related pair: copy + mutate */
            for (int64_t i = 0; i < tl && i < ql; ++i)
                if ((rnd() & 7) != 0) qs[i] = ts[i];
        uint32_t *cig = 0;
        int32_t n_cig = 0;
        int64_t n_it = 0;
        int32_t step = (t % 3 == 0) ? 17 : 0;
        int32_t s = mgt_wfa_exact2((const char *)ts, (int32_t)tl,
                                   (const char *)qs, (int32_t)ql,
                                   4, 4, 2, 15, 1, 1, 0, 0, step,
                                   &cig, &n_cig, &n_it);
        if (s >= 0 && n_cig > 0) {
            int64_t aplen = 0;
            for (int32_t i = 0; i < n_cig; ++i)
                if ((cig[i] & 0xf) != 1) aplen += cig[i] >> 4;
            char *ds = malloc(4 * (tl + ql) + 64);
            int64_t *off = malloc(8 * (2 * (tl + ql) + 8)), n_off = 0;
            mgt_gen_ds(cig, n_cig, ts, aplen, qs, 0, ql,
                       ds, 4 * (tl + ql) + 64, off,
                       2 * (tl + ql) + 8, &n_off);
            free(ds); free(off);
        }
        if (cig) mgt_wfa_free(cig);
        free(ts); free(qs);
    }
    printf("selftest ok\n");
    return 0;
}
