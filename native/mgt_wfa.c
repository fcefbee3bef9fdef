/* 2-piece affine-gap wavefront aligner — native host kernel.
 *
 * Exact-semantics implementation of the WFA variant used by the
 * framework (and behavior-equal to the reference miniwfa): a stripe of
 * max_pen+1 wavefront slices of (H,E1,F1,E2,F2) per diagonal, 8-byte
 * exact-match extension, band shrinking every 256 scores, and a
 * bit-packed traceback.  Called from Python via ctypes; the numpy
 * implementation in align/wfa.py is the validation oracle.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define WF_NEG_INF (-0x40000000)

typedef struct {
    int32_t lo, hi;
    int32_t *mem, *H, *E1, *E2, *F1, *F2;
} wf_slice_t;

typedef struct {
    int32_t s, top, n, max_pen, lo, hi;
    wf_slice_t *a;
} wf_stripe_t;

typedef struct {
    int32_t lo, hi;
    uint8_t *x;
} wf_tb1_t;

typedef struct {
    int32_t n, m;
    wf_tb1_t *a;
} wf_tb_t;

static void slice_fill(wf_slice_t *f, int32_t lo, int32_t hi, int32_t m1)
{
    int32_t i, n = hi - lo + 1, m2 = m1 * 2;
    f->lo = lo, f->hi = hi;
    free(f->mem);
    f->mem = (int32_t *)malloc(sizeof(int32_t) * 5 * (size_t)(n + m2));
    f->H = f->mem + m1;
    f->E1 = f->H + n + m2;
    f->F1 = f->E1 + n + m2;
    f->E2 = f->F1 + n + m2;
    f->F2 = f->E2 + n + m2;
    for (i = -m1; i < 0; ++i)
        f->H[i] = f->E1[i] = f->E2[i] = f->F1[i] = f->F2[i] = WF_NEG_INF;
    for (i = n; i < n + m1; ++i)
        f->H[i] = f->E1[i] = f->E2[i] = f->F1[i] = f->F2[i] = WF_NEG_INF;
    f->H -= lo, f->E1 -= lo, f->E2 -= lo, f->F1 -= lo, f->F2 -= lo;
}

static void stripe_add(wf_stripe_t *wf, int32_t lo, int32_t hi)
{
    wf_slice_t *f;
    ++wf->s;
    ++wf->top;
    if (wf->top == wf->n) wf->top = 0;
    f = &wf->a[wf->top];
    /* un-offset the stale pointers before refilling */
    if (f->mem) f->H = f->E1 = f->E2 = f->F1 = f->F2 = 0;
    slice_fill(f, lo, hi, wf->max_pen + 1);
}

static wf_stripe_t *stripe_init(int32_t max_pen)
{
    int32_t i;
    wf_stripe_t *wf = (wf_stripe_t *)calloc(1, sizeof(wf_stripe_t));
    wf->max_pen = max_pen;
    wf->n = max_pen + 1;
    wf->a = (wf_slice_t *)calloc(wf->n, sizeof(wf_slice_t));
    wf->lo = wf->hi = 0;
    for (i = 0; i < wf->n; ++i) {
        wf_slice_t *f;
        stripe_add(wf, 0, 0);
        f = &wf->a[wf->top];
        f->H[0] = f->E1[0] = f->E2[0] = f->F1[0] = f->F2[0] = WF_NEG_INF;
    }
    wf->s = 0;
    wf->a[wf->top].H[0] = -1;
    return wf;
}

static void stripe_destroy(wf_stripe_t *wf)
{
    int32_t i;
    for (i = 0; i < wf->n; ++i) free(wf->a[i].mem);
    free(wf->a);
    free(wf);
}

static inline wf_slice_t *stripe_get(const wf_stripe_t *wf, int32_t x)
{
    int32_t y = wf->top - x;
    if (y < 0) y += wf->n;
    return &wf->a[y];
}

static inline int good_diag(int32_t d, int32_t k, int32_t tl, int32_t ql)
{
    return ((k >= -1 && k < tl) && (d + k >= -1 && d + k < ql));
}

static void stripe_shrink(wf_stripe_t *wf, int32_t tl, int32_t ql)
{
    int32_t j, d;
    for (d = wf->lo; d <= wf->hi; ++d) {
        for (j = 0; j < wf->n; ++j) {
            wf_slice_t *p = &wf->a[(wf->top + 1 + j) % wf->n];
            if (d < p->lo || d > p->hi) continue;
            if (good_diag(d, p->H[d], tl, ql)) break;
            if (good_diag(d, p->E1[d], tl, ql) || good_diag(d, p->F1[d], tl, ql)) break;
            if (good_diag(d, p->E2[d], tl, ql) || good_diag(d, p->F2[d], tl, ql)) break;
        }
        if (j < wf->n) break;
    }
    wf->lo = d;
    for (d = wf->hi; d >= wf->lo; --d) {
        for (j = 0; j < wf->n; ++j) {
            wf_slice_t *p = &wf->a[(wf->top + 1 + j) % wf->n];
            if (d < p->lo || d > p->hi) continue;
            if (good_diag(d, p->H[d], tl, ql)) break;
            if (good_diag(d, p->E1[d], tl, ql) || good_diag(d, p->F1[d], tl, ql)) break;
            if (good_diag(d, p->E2[d], tl, ql) || good_diag(d, p->F2[d], tl, ql)) break;
        }
        if (j < wf->n) break;
    }
    wf->hi = d;
}

static inline int32_t extend1(const char *ts, const char *qs, int32_t k, int32_t d)
{
    /* strings are padded with 8 distinct trailing bytes each */
    uint64_t cmp = 0;
    const char *ts_ = ts + 1;
    const char *qs_ = qs + d + 1;
    while (1) {
        uint64_t x, y;
        memcpy(&x, ts_ + k, 8);
        memcpy(&y, qs_ + k, 8);
        cmp = x ^ y;
        if (cmp == 0) k += 8;
        else break;
    }
    k += __builtin_ctzll(cmp) >> 3;
    return k;
}

#define WF_MAX(a, b) ((a) >= (b) ? (a) : (b))

typedef struct {
    int32_t x, o1, e1, o2, e2;
} wf_pen_t;

static void next_basic(const wf_pen_t *pen, wf_stripe_t *wf, wf_tb_t *tb,
                       int32_t lo, int32_t hi)
{
    int32_t d, *H, *E1, *E2, *F1, *F2;
    const int32_t *pHx, *pHo1, *pHo2, *pE1, *pE2, *pF1, *pF2;
    const wf_slice_t *fx, *fo1, *fo2, *fe1, *fe2;
    wf_slice_t *ft;
    stripe_add(wf, lo, hi);
    ft = &wf->a[wf->top];
    fx = stripe_get(wf, pen->x);
    fo1 = stripe_get(wf, pen->o1 + pen->e1);
    fo2 = stripe_get(wf, pen->o2 + pen->e2);
    fe1 = stripe_get(wf, pen->e1);
    fe2 = stripe_get(wf, pen->e2);
    pHx = fx->H, pHo1 = fo1->H, pHo2 = fo2->H;
    pE1 = fe1->E1, pE2 = fe2->E2, pF1 = fe1->F1, pF2 = fe2->F2;
    H = ft->H, E1 = ft->E1, E2 = ft->E2, F1 = ft->F1, F2 = ft->F2;
    if (tb) {
        uint8_t *ax;
        wf_tb1_t *q;
        if (tb->n == tb->m) {
            tb->m += (tb->m >> 1) + 4;
            tb->a = (wf_tb1_t *)realloc(tb->a, sizeof(wf_tb1_t) * tb->m);
        }
        q = &tb->a[tb->n++];
        q->lo = lo, q->hi = hi;
        q->x = (uint8_t *)calloc(hi - lo + 1, 1);
        ax = q->x - lo;
        for (d = lo; d <= hi; ++d) {
            int32_t h, f, e;
            uint8_t x = 0, ze, zf, z;
            x |= pHo1[d - 1] >= pE1[d - 1] ? 0 : 0x08;
            E1[d] = WF_MAX(pHo1[d - 1], pE1[d - 1]);
            x |= pHo2[d - 1] >= pE2[d - 1] ? 0 : 0x20;
            E2[d] = WF_MAX(pHo2[d - 1], pE2[d - 1]);
            ze = E1[d] >= E2[d] ? 1 : 3;
            e = WF_MAX(E1[d], E2[d]);
            x |= pHo1[d + 1] >= pF1[d + 1] ? 0 : 0x10;
            F1[d] = WF_MAX(pHo1[d + 1], pF1[d + 1]) + 1;
            x |= pHo2[d + 1] >= pF2[d + 1] ? 0 : 0x40;
            F2[d] = WF_MAX(pHo2[d + 1], pF2[d + 1]) + 1;
            zf = F1[d] >= F2[d] ? 2 : 4;
            f = WF_MAX(F1[d], F2[d]);
            z = e >= f ? ze : zf;
            h = WF_MAX(e, f);
            z = pHx[d] + 1 >= h ? 0 : z;
            H[d] = WF_MAX(pHx[d] + 1, h);
            ax[d] = x | z;
        }
    } else {
        for (d = lo; d <= hi; ++d) {
            int32_t h, f, e;
            E1[d] = WF_MAX(pHo1[d - 1], pE1[d - 1]);
            E2[d] = WF_MAX(pHo2[d - 1], pE2[d - 1]);
            e = WF_MAX(E1[d], E2[d]);
            F1[d] = WF_MAX(pHo1[d + 1], pF1[d + 1]) + 1;
            F2[d] = WF_MAX(pHo2[d + 1], pF2[d + 1]) + 1;
            f = WF_MAX(F1[d], F2[d]);
            h = WF_MAX(e, f);
            H[d] = WF_MAX(pHx[d] + 1, h);
        }
    }
    if (H[lo] >= -1 || E1[lo] >= -1 || F1[lo] >= -1 || E2[lo] >= -1 || F2[lo] >= -1) wf->lo = lo;
    if (H[hi] >= -1 || E1[hi] >= -1 || F1[hi] >= -1 || E2[hi] >= -1 || F2[hi] >= -1) wf->hi = hi;
}

typedef struct {
    int32_t n, m;
    uint32_t *a;
} wf_cig_t;

static void cig_push(wf_cig_t *c, int32_t op, int32_t len)
{
    if (c->n && op == (int32_t)(c->a[c->n - 1] & 0xf)) {
        c->a[c->n - 1] += (uint32_t)len << 4;
    } else {
        if (c->n == c->m) {
            c->m += (c->m >> 1) + 8;
            c->a = (uint32_t *)realloc(c->a, 4 * c->m);
        }
        c->a[c->n++] = (uint32_t)len << 4 | op;
    }
}

static uint32_t *wf_traceback(const wf_pen_t *pen, wf_tb_t *tb, int32_t t_end,
                              const char *ts, int32_t q_end, const char *qs,
                              int32_t last, int32_t *n_cigar)
{
    wf_cig_t cigar = {0, 0, 0};
    int32_t i = q_end, k = t_end, s = tb->n - 1;
    while (i >= 0 && k >= 0) {
        int32_t k0 = k, j, x, state, ext;
        if (last == 0) {
            while (i >= 0 && k >= 0 && qs[i] == ts[k]) --i, --k;
            if (k0 - k > 0) cig_push(&cigar, 7, k0 - k);
            if (i < 0 || k < 0) break;
        }
        j = i - k - tb->a[s].lo;
        x = tb->a[s].x[j];
        state = last == 0 ? x & 7 : last;
        ext = state > 0 ? x >> (state + 2) & 1 : 0;
        if (state == 0) {
            cig_push(&cigar, 8, 1);
            --i, --k, s -= pen->x;
        } else if (state == 1) {
            cig_push(&cigar, 1, 1);
            --i, s -= ext ? pen->e1 : pen->o1 + pen->e1;
        } else if (state == 3) {
            cig_push(&cigar, 1, 1);
            --i, s -= ext ? pen->e2 : pen->o2 + pen->e2;
        } else if (state == 2) {
            cig_push(&cigar, 2, 1);
            --k, s -= ext ? pen->e1 : pen->o1 + pen->e1;
        } else {
            cig_push(&cigar, 2, 1);
            --k, s -= ext ? pen->e2 : pen->o2 + pen->e2;
        }
        last = state > 0 && ext ? state : 0;
    }
    if (i >= 0) cig_push(&cigar, 1, i + 1);
    else if (k >= 0) cig_push(&cigar, 2, k + 1);
    for (i = 0; i < cigar.n >> 1; ++i) {
        uint32_t t = cigar.a[i];
        cigar.a[i] = cigar.a[cigar.n - i - 1];
        cigar.a[cigar.n - i - 1] = t;
    }
    *n_cigar = cigar.n;
    return cigar.a;
}

/* ----------------------------------------------------------------- */
/* low-memory checkpoint mode (miniwfa.c:440-601 semantics)           */
/* ----------------------------------------------------------------- */

typedef struct { int32_t s, d; } wf_chkpt_t;

typedef struct {
    int32_t n, n_intv, max_s;
    int32_t *x;
    uint64_t *intv;
} wf_ss_t;

typedef struct { int32_t n, m; wf_ss_t *a; } wf_sss_t;

static void wf_snapshot1(wf_stripe_t *sf, wf_ss_t *ss)
{
    int32_t j, k, t;
    ss->n = 0, ss->max_s = sf->s;
    for (j = 0; j < sf->n; ++j)
        ss->n += 5 * (sf->a[j].hi - sf->a[j].lo + 1);
    ss->x = (int32_t *)malloc(4 * (size_t)ss->n);
    ss->n_intv = sf->n;
    ss->intv = (uint64_t *)malloc(8 * sf->n);
    for (j = 0, t = 0; j < sf->n; ++j) {
        wf_slice_t *p = &sf->a[(sf->top + 1 + j) % sf->n];
        ss->intv[j] = (uint64_t)(uint32_t)p->lo << 32
            | (uint32_t)((p->hi - p->lo + 1) * 5);
        for (k = p->lo; k <= p->hi; ++k) {
            ss->x[t] = p->H[k],  p->H[k] = t++;
            ss->x[t] = p->E1[k], p->E1[k] = t++;
            ss->x[t] = p->F1[k], p->F1[k] = t++;
            ss->x[t] = p->E2[k], p->E2[k] = t++;
            ss->x[t] = p->F2[k], p->F2[k] = t++;
        }
    }
}

static void wf_snapshot(wf_sss_t *sss, wf_stripe_t *sf)
{
    if (sss->n == sss->m) {
        sss->m += (sss->m >> 1) + 8;
        sss->a = (wf_ss_t *)realloc(sss->a, sizeof(wf_ss_t) * sss->m);
    }
    wf_snapshot1(sf, &sss->a[sss->n++]);
}

static void wf_next_seg(const wf_pen_t *pen, uint8_t *xbuf, wf_stripe_t *wf,
                        wf_stripe_t *sf, int32_t lo, int32_t hi)
{
    int32_t d, *H, *E1, *E2, *F1, *F2;
    const int32_t *pHx, *pHo1, *pHo2, *pE1, *pE2, *pF1, *pF2;
    const wf_slice_t *fx, *fo1, *fo2, *fe1, *fe2;
    wf_slice_t *ft;
    uint8_t *ax = xbuf - lo;

    /* score stripe with traceback bits into xbuf */
    stripe_add(wf, lo, hi);
    ft = &wf->a[wf->top];
    fx = stripe_get(wf, pen->x);
    fo1 = stripe_get(wf, pen->o1 + pen->e1);
    fo2 = stripe_get(wf, pen->o2 + pen->e2);
    fe1 = stripe_get(wf, pen->e1);
    fe2 = stripe_get(wf, pen->e2);
    pHx = fx->H, pHo1 = fo1->H, pHo2 = fo2->H;
    pE1 = fe1->E1, pE2 = fe2->E2, pF1 = fe1->F1, pF2 = fe2->F2;
    H = ft->H, E1 = ft->E1, E2 = ft->E2, F1 = ft->F1, F2 = ft->F2;
    for (d = lo; d <= hi; ++d) {
        int32_t h, f, e;
        uint8_t x = 0, ze, zf, z;
        x |= pHo1[d - 1] >= pE1[d - 1] ? 0 : 0x08;
        E1[d] = WF_MAX(pHo1[d - 1], pE1[d - 1]);
        x |= pHo2[d - 1] >= pE2[d - 1] ? 0 : 0x20;
        E2[d] = WF_MAX(pHo2[d - 1], pE2[d - 1]);
        ze = E1[d] >= E2[d] ? 1 : 3;
        e = WF_MAX(E1[d], E2[d]);
        x |= pHo1[d + 1] >= pF1[d + 1] ? 0 : 0x10;
        F1[d] = WF_MAX(pHo1[d + 1], pF1[d + 1]) + 1;
        x |= pHo2[d + 1] >= pF2[d + 1] ? 0 : 0x40;
        F2[d] = WF_MAX(pHo2[d + 1], pF2[d + 1]) + 1;
        zf = F1[d] >= F2[d] ? 2 : 4;
        f = WF_MAX(F1[d], F2[d]);
        z = e >= f ? ze : zf;
        h = WF_MAX(e, f);
        z = pHx[d] + 1 >= h ? 0 : z;
        H[d] = WF_MAX(pHx[d] + 1, h);
        ax[d] = x | z;
    }
    /* shadow stripe: propagate snapshot pointers per the chosen ops */
    stripe_add(sf, lo, hi);
    ft = &sf->a[sf->top];
    fx = stripe_get(sf, pen->x);
    fo1 = stripe_get(sf, pen->o1 + pen->e1);
    fo2 = stripe_get(sf, pen->o2 + pen->e2);
    fe1 = stripe_get(sf, pen->e1);
    fe2 = stripe_get(sf, pen->e2);
    pHx = fx->H, pHo1 = fo1->H, pHo2 = fo2->H;
    pE1 = fe1->E1, pE2 = fe2->E2, pF1 = fe1->F1, pF2 = fe2->F2;
    H = ft->H, E1 = ft->E1, E2 = ft->E2, F1 = ft->F1, F2 = ft->F2;
    for (d = lo; d <= hi; ++d) {
        uint8_t x = ax[d];
        int32_t a, b, e1, f1, e2, f2, h;
        a = pHo1[d - 1], b = pE1[d - 1];
        e1 = E1[d] = (x & 0x08) == 0 ? a : b;
        a = pHo1[d + 1], b = pF1[d + 1];
        f1 = F1[d] = (x & 0x10) == 0 ? a : b;
        a = pHo2[d - 1], b = pE2[d - 1];
        e2 = E2[d] = (x & 0x20) == 0 ? a : b;
        a = pHo2[d + 1], b = pF2[d + 1];
        f2 = F2[d] = (x & 0x40) == 0 ? a : b;
        x &= 7;
        h = pHx[d];
        h = x == 1 ? e1 : h;
        h = x == 2 ? f1 : h;
        h = x == 3 ? e2 : h;
        h = x == 4 ? f2 : h;
        H[d] = h;
    }
    if (H[lo] >= -1 || E1[lo] >= -1 || F1[lo] >= -1 || E2[lo] >= -1 || F2[lo] >= -1) wf->lo = lo;
    if (H[hi] >= -1 || E1[hi] >= -1 || F1[hi] >= -1 || E2[hi] >= -1 || F2[hi] >= -1) wf->hi = hi;
}

static wf_chkpt_t *wf_traceback_seg(wf_sss_t *sss, int32_t last,
                                    int32_t *n_seg)
{
    int32_t j;
    wf_chkpt_t *seg;
    *n_seg = sss->n;
    seg = (wf_chkpt_t *)malloc(sizeof(wf_chkpt_t) * (sss->n ? sss->n : 1));
    for (j = sss->n - 1; j >= 0; --j) {
        int32_t k, m;
        wf_ss_t *p = &sss->a[j];
        for (k = 0, m = 0; k < p->n_intv; ++k) {
            if (last >= m && last < m + (int32_t)(uint32_t)p->intv[k])
                break;
            m += (int32_t)(uint32_t)p->intv[k];
        }
        seg[j].s = p->max_s - (p->n_intv - k - 1);
        seg[j].d = (int32_t)(p->intv[k] >> 32) + (last - m) / 5;
        last = p->x[last];
    }
    return seg;
}

static wf_chkpt_t *wfa_seg_pass(const wf_pen_t *pen, int32_t max_pen,
                                int32_t tl, const char *pts, int32_t ql,
                                const char *pqs, int32_t step,
                                int32_t *n_seg_)
{
    int32_t last = -1, n_seg, j;
    wf_stripe_t *wf, *sf;
    wf_sss_t sss = {0, 0, 0};
    uint8_t *xbuf;
    wf_chkpt_t *seg;

    xbuf = (uint8_t *)calloc(tl + ql + 1, 1);
    wf = stripe_init(max_pen);
    sf = stripe_init(max_pen);
    while (1) {
        wf_slice_t *p = &wf->a[wf->top];
        int32_t d, lo, hi, *H = p->H;
        for (d = p->lo; d <= p->hi; ++d) {
            int32_t k;
            if (H[d] < -1 || d + H[d] < -1 || H[d] >= tl || d + H[d] >= ql) continue;
            k = extend1(pts, pqs, H[d], d);
            if (k == tl - 1 && d + k == ql - 1) {
                last = sf->a[sf->top].H[d];
                break;
            }
            H[d] = k;
        }
        if (d <= p->hi) break;
        lo = wf->lo > -tl ? wf->lo - 1 : -tl;
        hi = wf->hi < ql ? wf->hi + 1 : ql;
        if ((wf->s + 1) % step == 0)
            wf_snapshot(&sss, sf);
        wf_next_seg(pen, xbuf, wf, sf, lo, hi);
        if ((wf->s & 0xff) == 0) stripe_shrink(wf, tl, ql);
    }
    seg = wf_traceback_seg(&sss, last, &n_seg);
    for (j = 0; j < sss.n; ++j) {
        free(sss.a[j].x);
        free(sss.a[j].intv);
    }
    free(sss.a);
    stripe_destroy(wf);
    stripe_destroy(sf);
    free(xbuf);
    *n_seg_ = n_seg;
    return seg;
}

/* Returns score >= 0, or -1 if stopped (budget exceeded).
 * When is_tb != 0, *cigar_out receives a malloc'd array the caller
 * frees with mgt_wfa_free(); *n_cigar_out its length.  step > 0
 * enables the reference's low-memory checkpoint mode. */
int32_t mgt_wfa_exact2(const char *ts0, int32_t tl, const char *qs0,
                       int32_t ql, int32_t px, int32_t po1, int32_t pe1,
                       int32_t po2, int32_t pe2, int32_t is_tb,
                       int32_t max_s, int64_t max_iter, int32_t step,
                       uint32_t **cigar_out, int32_t *n_cigar_out,
                       int64_t *n_iter_out)
{
    wf_pen_t pen = {px, po1, pe1, po2, pe2};
    int32_t max_pen, last_state = 0, stopped = 0, score, i, sid = 0;
    int32_t n_seg = 0;
    int64_t n_iter = 0;
    wf_stripe_t *wf;
    wf_tb_t tb = {0, 0, 0};
    wf_chkpt_t *seg = 0;
    char *pts, *pqs;
    uint8_t used[256];
    int c1 = -1, c2 = -1;

    if (cigar_out) *cigar_out = 0;
    if (n_cigar_out) *n_cigar_out = 0;

    /* pad both strings with distinct unused characters */
    memset(used, 0, 256);
    for (i = 0; i < tl; ++i) used[(uint8_t)ts0[i]] = 1;
    for (i = 0; i < ql; ++i) used[(uint8_t)qs0[i]] = 1;
    for (i = 0; i < 256; ++i)
        if (!used[i]) { if (c1 < 0) c1 = i; else if (c2 < 0) { c2 = i; break; } }
    pts = (char *)malloc(tl + ql + 16);
    pqs = pts + tl + 8;
    memcpy(pts, ts0, tl);
    memset(pts + tl, c1, 8);
    memcpy(pqs, qs0, ql);
    memset(pqs + ql, c2, 8);

    max_pen = px;
    max_pen = WF_MAX(max_pen, po1 + pe1);
    max_pen = WF_MAX(max_pen, po2 + pe2);
    if (step > 0)
        seg = wfa_seg_pass(&pen, max_pen, tl, pts, ql, pqs, step, &n_seg);
    wf = stripe_init(max_pen);

    while (1) {
        wf_slice_t *p = &wf->a[wf->top];
        int32_t d, lo, hi, *H = p->H;
        for (d = p->lo; d <= p->hi; ++d) {
            int32_t k;
            if (H[d] < -1 || d + H[d] < -1 || H[d] >= tl || d + H[d] >= ql) continue;
            k = extend1(pts, pqs, H[d], d);
            if (k == tl - 1 && d + k == ql - 1) {
                if (k == H[d] && is_tb)
                    last_state = tb.a[tb.n - 1].x[d - tb.a[tb.n - 1].lo] & 7;
                break;
            }
            H[d] = k;
        }
        if (d <= p->hi) break;
        if (is_tb && seg && sid < n_seg && seg[sid].s == wf->s)
            wf->lo = wf->hi = seg[sid++].d;
        lo = wf->lo > -tl ? wf->lo - 1 : -tl;
        hi = wf->hi < ql ? wf->hi + 1 : ql;
        next_basic(&pen, wf, is_tb ? &tb : 0, lo, hi);
        if ((wf->s & 0xff) == 0) stripe_shrink(wf, tl, ql);
        n_iter += hi - lo + 1;
        if ((max_iter > 0 && n_iter > max_iter) || (max_s > 0 && wf->s > max_s)) {
            stopped = 1;
            break;
        }
    }
    free(seg);
    score = stopped ? -1 : wf->s;
    if (is_tb && !stopped && cigar_out)
        *cigar_out = wf_traceback(&pen, &tb, tl - 1, pts, ql - 1, pqs,
                                  last_state, n_cigar_out);
    if (n_iter_out) *n_iter_out = n_iter;
    for (i = 0; i < tb.n; ++i) free(tb.a[i].x);
    free(tb.a);
    stripe_destroy(wf);
    free(pts);
    return score;
}

void mgt_wfa_free(uint32_t *p)
{
    free(p);
}

/* legacy entry point (no checkpoint mode) */
int32_t mgt_wfa_exact(const char *ts0, int32_t tl, const char *qs0,
                      int32_t ql, int32_t px, int32_t po1, int32_t pe1,
                      int32_t po2, int32_t pe2, int32_t is_tb,
                      int32_t max_s, int64_t max_iter, uint32_t **cigar_out,
                      int32_t *n_cigar_out, int64_t *n_iter_out)
{
    return mgt_wfa_exact2(ts0, tl, qs0, ql, px, po1, pe1, po2, pe2, is_tb,
                          max_s, max_iter, 0, cigar_out, n_cigar_out,
                          n_iter_out);
}
