/* Linear anchor chaining — native host kernels.
 *
 * Exact-semantics implementations of the two chaining DP engines
 * (banded DP and RMQ long-range chaining over an augmented AVL), the
 * shared peak backtrack, and anchor compaction, matching the python
 * engines in mapping/lchain.py / lchain_rmq.py bit for bit (float32
 * penalties with the fast log2 approximation, int truncation, exact
 * radix tie order; compile with -ffp-contract=off).
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define I32_MIN (-0x80000000LL)

extern void mgt_radix_sort_128x(uint64_t *a, int64_t n);

/* --dbg-lc-prof counters (lchain.c:153,209,361), read via ctypes */
int64_t mgt_lchain_stats[4];

static inline float mg_log2f(float x)
{
    union { float f; uint32_t i; } z = { x };
    float log_2 = (float)(int32_t)(((z.i >> 23) & 255) - 128);
    z.i &= ~(255u << 23);
    z.i += 127u << 23;
    log_2 += (-0.34484843f * z.f + 2.02466578f) * z.f - 0.67487759f;
    return log_2;
}

/* ----------------------------------------------------------------- */
/* transition scores                                                  */
/* ----------------------------------------------------------------- */

static inline int64_t comput_sc(uint64_t xi, uint64_t yi, uint64_t xj,
                                uint64_t yj, int32_t max_dist_x,
                                int32_t max_dist_y, int32_t bw,
                                float chn_pen_gap, float chn_pen_skip,
                                int is_cdna, int n_seg)
{
    int32_t dq = (int32_t)yi - (int32_t)yj, dr, dd, dg, q_span;
    int64_t sc;
    int32_t sidi = (int32_t)(yi >> 48 & 0xff), sidj = (int32_t)(yj >> 48 & 0xff);
    if (dq <= 0 || dq > max_dist_x) return I32_MIN;
    dr = (int32_t)(xi - xj);
    if (sidi == sidj && (dr == 0 || dq > max_dist_y)) return I32_MIN;
    dd = dr > dq ? dr - dq : dq - dr;
    if (sidi == sidj && dd > bw) return I32_MIN;
    if (n_seg > 1 && !is_cdna && sidi == sidj && dr > max_dist_y) return I32_MIN;
    dg = dr < dq ? dr : dq;
    q_span = (int32_t)(yj >> 32 & 0xff);
    sc = q_span < dg ? q_span : dg;
    if (dd || dg > q_span) {
        float lin_pen, log_pen;
        lin_pen = chn_pen_gap * (float)dd + chn_pen_skip * (float)dg;
        log_pen = dd >= 1 ? mg_log2f(dd + 1) : 0.0f;
        if (is_cdna || sidi != sidj) {
            if (sidi != sidj && dr == 0) ++sc;
            else if (dr > dq || sidi != sidj)
                sc -= (int)(lin_pen < log_pen ? lin_pen : log_pen);
            else sc -= (int)(lin_pen + .5f * log_pen);
        } else sc -= (int)(lin_pen + .5f * log_pen);
    }
    return sc;
}

static inline int64_t comput_sc_simple(uint64_t xi, uint64_t yi, uint64_t xj,
                                       uint64_t yj, float chn_pen_gap,
                                       float chn_pen_skip, int32_t *exact,
                                       int32_t *width)
{
    int32_t dq = (int32_t)yi - (int32_t)yj, dr, dd, dg, q_span;
    int64_t sc;
    dr = (int32_t)(xi - xj);
    *width = dd = dr > dq ? dr - dq : dq - dr;
    dg = dr < dq ? dr : dq;
    q_span = (int32_t)(yj >> 32 & 0xff);
    sc = q_span < dg ? q_span : dg;
    if (exact) *exact = (dd == 0 && dg <= q_span);
    if (dd || dq > q_span) {
        float lin_pen, log_pen;
        lin_pen = chn_pen_gap * (float)dd + chn_pen_skip * (float)dg;
        log_pen = dd >= 1 ? mg_log2f(dd + 1) : 0.0f;
        sc -= (int)(lin_pen + .5f * log_pen);
    }
    return sc;
}

/* ----------------------------------------------------------------- */
/* peak backtrack + compaction (lchain.c:27-112 semantics)            */
/* ----------------------------------------------------------------- */

static int64_t bk_end(int32_t max_drop, const uint64_t *zx, const int64_t *zy,
                      const int64_t *f, const int64_t *p, int32_t *t,
                      int64_t k)
{
    int64_t i = zy[k], end_i = -1, max_i = i;
    int64_t max_s = 0;
    if (i < 0 || t[i] != 0) return i;
    do {
        int64_t s;
        t[i] = 2;
        end_i = i = p[i];
        s = i < 0 ? (int64_t)zx[k] : (int64_t)(int32_t)(uint32_t)zx[k] - f[i];
        if (s > max_s) max_s = s, max_i = i;
        else if (max_s - s > max_drop) break;
    } while (i >= 0 && t[i] == 0);
    for (i = zy[k]; i >= 0 && i != end_i; i = p[i]) t[i] = 0;
    return max_i;
}

/* returns n_v; fills u (score<<32|cnt) and v (anchor indices) */
static int64_t chain_backtrack(int64_t n, const int64_t *f, const int64_t *p,
                               int32_t min_cnt, int32_t min_sc,
                               int32_t max_drop, uint64_t *u, int32_t *n_u_,
                               int64_t *v)
{
    int64_t i, k, n_z, n_v;
    int32_t n_u;
    uint64_t *z;
    int32_t *t;

    *n_u_ = 0;
    for (i = 0, n_z = 0; i < n; ++i)
        if (f[i] >= min_sc) ++n_z;
    if (n_z == 0) return 0;
    z = (uint64_t *)malloc(16 * n_z);
    for (i = 0, k = 0; i < n; ++i)
        if (f[i] >= min_sc) z[2 * k] = (uint64_t)f[i], z[2 * k + 1] = i, ++k;
    mgt_radix_sort_128x(z, n_z);
    t = (int32_t *)calloc(n, 4);
    {
        /* single pass (python-equivalent): collect u and v together */
        uint64_t *zx = (uint64_t *)malloc(8 * n_z);
        int64_t *zy = (int64_t *)malloc(8 * n_z);
        for (k = 0; k < n_z; ++k) zx[k] = z[2 * k], zy[k] = (int64_t)z[2 * k + 1];
        for (k = n_z - 1, n_v = 0, n_u = 0; k >= 0; --k) {
            if (t[zy[k]] == 0) {
                int64_t n_v0 = n_v, end_i, sc;
                end_i = bk_end(max_drop, zx, zy, f, p, t, k);
                for (i = zy[k]; i != end_i; i = p[i])
                    v[n_v++] = i, t[i] = 1;
                sc = i < 0 ? (int64_t)zx[k]
                           : (int64_t)(int32_t)(uint32_t)zx[k] - f[i];
                if (sc >= min_sc && n_v > n_v0 && n_v - n_v0 >= min_cnt)
                    u[n_u++] = (uint64_t)sc << 32 | (uint64_t)(n_v - n_v0);
                else n_v = n_v0;
            }
        }
        free(zx); free(zy);
    }
    free(z); free(t);
    *n_u_ = n_u;
    return n_v;
}

static void compact_a(int32_t n_u, uint64_t *u, int64_t n_v, const int64_t *v,
                      uint64_t *ax, uint64_t *ay)
{
    uint64_t *bx = (uint64_t *)malloc(8 * n_v);
    uint64_t *by = (uint64_t *)malloc(8 * n_v);
    uint64_t *w = (uint64_t *)malloc(16 * (n_u ? n_u : 1));
    uint64_t *u2 = (uint64_t *)malloc(8 * (n_u ? n_u : 1));
    int64_t i, j, k;
    for (i = 0, k = 0; i < n_u; ++i) {
        int64_t k0 = k, ni = (int32_t)u[i];
        for (j = 0; j < ni; ++j) {
            int64_t src = v[k0 + (ni - j - 1)];
            bx[k] = ax[src];
            by[k] = ay[src];
            ++k;
        }
    }
    for (i = 0, k = 0; i < n_u; ++i) {
        w[2 * i] = bx[k];
        w[2 * i + 1] = (uint64_t)k << 32 | (uint64_t)i;
        k += (int32_t)u[i];
    }
    mgt_radix_sort_128x(w, n_u);
    for (i = 0, k = 0; i < n_u; ++i) {
        int64_t j2 = (int32_t)w[2 * i + 1], nj = (int32_t)u[j2];
        int64_t src = (int64_t)(w[2 * i + 1] >> 32);
        u2[i] = u[j2];
        memcpy(&ax[k], &bx[src], 8 * nj);
        memcpy(&ay[k], &by[src], 8 * nj);
        k += nj;
    }
    memcpy(u, u2, 8 * n_u);
    free(bx); free(by); free(w); free(u2);
}

/* ----------------------------------------------------------------- */
/* banded DP chaining (mg_lchain_dp semantics)                        */
/* ----------------------------------------------------------------- */

int64_t mgt_lchain_dp(int32_t max_dist_x, int32_t max_dist_y, int32_t bw,
                      int32_t max_skip, int32_t max_iter, int32_t min_cnt,
                      int32_t min_sc, float chn_pen_gap, float chn_pen_skip,
                      int32_t is_cdna, int32_t n_seg, int64_t n,
                      uint64_t *ax, uint64_t *ay, uint64_t *u_out,
                      int32_t *n_u_out)
{
    int64_t *p, *f, *v_pk, i, j, max_ii, st = 0, n_v;
    int32_t *t, n_u, max_drop = bw;
    int64_t *vv;

    *n_u_out = 0;
    if (n == 0) return 0;
    if (max_dist_x < bw) max_dist_x = bw;
    if (max_dist_y < bw && !is_cdna) max_dist_y = bw;
    if (is_cdna) max_drop = 0x7fffffff;
    p = (int64_t *)malloc(8 * n);
    f = (int64_t *)malloc(8 * n);
    v_pk = (int64_t *)malloc(8 * n);
    t = (int32_t *)calloc(n, 4);
    for (i = 0; i < n; ++i) t[i] = -1;

    int64_t n_iter = 0, mmax_f = 0;
    for (i = 0, max_ii = -1; i < n; ++i) {
        int64_t max_j = -1, end_j;
        int64_t max_f = (int64_t)(ay[i] >> 32 & 0xff);
        int32_t n_skip = 0;
        while (st < i && (ax[i] >> 32 != ax[st] >> 32
                          || ax[i] > ax[st] + (uint64_t)max_dist_x))
            ++st;
        if (i - st > max_iter) st = i - max_iter;
        for (j = i - 1; j >= st; --j) {
            int64_t sc = comput_sc(ax[i], ay[i], ax[j], ay[j], max_dist_x,
                                   max_dist_y, bw, chn_pen_gap, chn_pen_skip,
                                   is_cdna, n_seg);
            ++n_iter;
            if (sc == I32_MIN) continue;
            sc += f[j];
            if (sc > max_f) {
                max_f = sc, max_j = j;
                if (n_skip > 0) --n_skip;
            } else if (t[j] == (int32_t)i) {
                if (++n_skip > max_skip) break;
            }
            if (p[j] >= 0) t[p[j]] = (int32_t)i;
        }
        end_j = j;
        if (max_ii < 0 || ax[i] > ax[max_ii] + (uint64_t)max_dist_x) {
            int64_t max = I32_MIN;
            max_ii = -1;
            for (j = i - 1; j >= st; --j)
                if (max < f[j]) max = f[j], max_ii = j;
        }
        if (max_ii >= 0 && max_ii < end_j) {
            int64_t tmp = comput_sc(ax[i], ay[i], ax[max_ii], ay[max_ii],
                                    max_dist_x, max_dist_y, bw, chn_pen_gap,
                                    chn_pen_skip, is_cdna, n_seg);
            if (tmp != I32_MIN && max_f < tmp + f[max_ii])
                max_f = tmp + f[max_ii], max_j = max_ii;
        }
        f[i] = max_f, p[i] = max_j;
        v_pk[i] = max_j >= 0 && v_pk[max_j] > max_f ? v_pk[max_j] : max_f;
        if (max_ii < 0 || (ax[i] <= ax[max_ii] + (uint64_t)max_dist_x
                           && f[max_ii] < f[i]))
            max_ii = i;
        if (mmax_f < max_f) mmax_f = max_f;
    }
    mgt_lchain_stats[0] = n_iter;
    mgt_lchain_stats[1] = mmax_f;
    mgt_lchain_stats[2] = mgt_lchain_stats[3] = 0;

    vv = (int64_t *)malloc(8 * n);
    n_v = chain_backtrack(n, f, p, min_cnt, min_sc, max_drop, u_out, &n_u,
                          vv);
    if (n_u > 0) compact_a(n_u, u_out, n_v, vv, ax, ay);
    free(p); free(f); free(v_pk); free(t); free(vv);
    *n_u_out = n_u;
    return n_u == 0 ? 0 : n_v;
}

/* ----------------------------------------------------------------- */
/* krmq: AVL with subtree size + subtree-min (utils/krmq.py port)     */
/* ----------------------------------------------------------------- */

typedef struct rnode_s {
    int32_t y;
    int64_t i;
    double pri;
    struct rnode_s *p[2], *s;
    signed char balance;
    uint32_t size;
} rnode_t;

typedef struct {
    rnode_t *pool;
    rnode_t **freev;
    int64_t n_pool, n_free;
} rpool_t;

static inline int rcmp(int32_t ay2, int64_t ai, const rnode_t *b)
{
    if (ay2 != b->y) return ay2 < b->y ? -1 : 1;
    if (ai != b->i) return ai < b->i ? -1 : 1;
    return 0;
}

#define RSIZE(q) ((q) ? (q)->size : 0u)

static inline void r_update_min(rnode_t *p, const rnode_t *q, const rnode_t *r)
{
    p->s = (!q || p->pri < q->s->pri) ? p : q->s;
    p->s = (!r || p->s->pri < r->s->pri) ? p->s : r->s;
}

static rnode_t *r_rotate1(rnode_t *p, int dir)
{
    int opp = 1 - dir;
    rnode_t *q = p->p[opp], *s = p->s;
    uint32_t size_p = p->size;
    p->size -= q->size - RSIZE(q->p[dir]);
    q->size = size_p;
    r_update_min(p, p->p[dir], q->p[dir]);
    q->s = s;
    p->p[opp] = q->p[dir];
    q->p[dir] = p;
    return q;
}

static rnode_t *r_rotate2(rnode_t *p, int dir)
{
    int b1, opp = 1 - dir;
    rnode_t *q = p->p[opp], *r = q->p[dir], *s = p->s;
    uint32_t size_x_dir = RSIZE(r->p[dir]);
    r->size = p->size;
    p->size -= q->size - size_x_dir;
    q->size -= size_x_dir + 1;
    r_update_min(p, p->p[dir], r->p[dir]);
    r_update_min(q, q->p[opp], r->p[opp]);
    r->s = s;
    p->p[opp] = r->p[dir];
    r->p[dir] = p;
    q->p[dir] = r->p[opp];
    r->p[opp] = q;
    b1 = dir == 0 ? +1 : -1;
    if (r->balance == b1) q->balance = 0, p->balance = -b1;
    else if (r->balance == 0) q->balance = p->balance = 0;
    else q->balance = b1, p->balance = 0;
    r->balance = 0;
    return r;
}

#define RMQ_MAX_DEPTH 64

static rnode_t *r_insert(rnode_t **root_, rnode_t *x)
{
    unsigned char stack[RMQ_MAX_DEPTH];
    rnode_t *path[RMQ_MAX_DEPTH];
    rnode_t *bp, *bq, *p, *q, *r = 0;
    int i, which = 0, top, b1, path_len;
    bp = *root_, bq = 0;
    for (p = bp, q = bq, top = path_len = 0; p;
         q = p, p = p->p[which]) {
        int cmp = rcmp(x->y, x->i, p);
        if (cmp == 0) return p;
        if (p->balance != 0) bq = q, bp = p, top = 0;
        stack[top++] = which = (cmp > 0);
        path[path_len++] = p;
    }
    x->balance = 0, x->size = 1, x->p[0] = x->p[1] = 0, x->s = x;
    if (q == 0) *root_ = x;
    else q->p[which] = x;
    if (bp == 0) return x;
    for (i = 0; i < path_len; ++i) ++path[i]->size;
    for (i = path_len - 1; i >= 0; --i) {
        r_update_min(path[i], path[i]->p[0], path[i]->p[1]);
        if (path[i]->s != x) break;
    }
    for (p = bp, top = 0; p != x; p = p->p[stack[top]], ++top)
        if (stack[top] == 0) --p->balance;
        else ++p->balance;
    if (bp->balance > -2 && bp->balance < 2) return x;
    which = (bp->balance < 0);
    b1 = which == 0 ? +1 : -1;
    q = bp->p[1 - which];
    if (q->balance == b1) {
        r = r_rotate1(bp, which);
        q->balance = bp->balance = 0;
    } else r = r_rotate2(bp, which);
    if (bq == 0) *root_ = r;
    else bq->p[bp != bq->p[0]] = r;
    return x;
}

static rnode_t *r_find(rnode_t *root, int32_t y, int64_t i)
{
    rnode_t *p = root;
    while (p) {
        int cmp = rcmp(y, i, p);
        if (cmp < 0) p = p->p[0];
        else if (cmp > 0) p = p->p[1];
        else return p;
    }
    return 0;
}

static rnode_t *r_erase(rnode_t **root_, const rnode_t *x)
{
    rnode_t *p, *path[RMQ_MAX_DEPTH], fake;
    unsigned char dir[RMQ_MAX_DEPTH];
    int i, d = 0, cmp;
    if (*root_ == 0) return 0;
    fake = **root_, fake.p[0] = *root_, fake.p[1] = 0;
    cmp = -1;
    p = &fake;
    while (cmp != 0) {
        int which = (cmp > 0);
        dir[d] = which;
        path[d++] = p;
        p = p->p[which];
        if (p == 0) return 0;
        cmp = rcmp(x->y, x->i, p);
    }
    for (i = 1; i < d; ++i) --path[i]->size;
    if (p->p[1] == 0) {
        path[d - 1]->p[dir[d - 1]] = p->p[0];
    } else {
        rnode_t *q = p->p[1];
        if (q->p[0] == 0) {
            q->p[0] = p->p[0];
            q->balance = p->balance;
            path[d - 1]->p[dir[d - 1]] = q;
            path[d] = q, dir[d++] = 1;
            q->size = p->size - 1;
        } else {
            rnode_t *r;
            int e = d++;
            for (;;) {
                dir[d] = 0;
                path[d++] = q;
                r = q->p[0];
                if (r->p[0] == 0) break;
                q = r;
            }
            r->p[0] = p->p[0];
            q->p[0] = r->p[1];
            r->p[1] = p->p[1];
            r->balance = p->balance;
            path[e - 1]->p[dir[e - 1]] = r;
            path[e] = r, dir[e] = 1;
            for (i = e + 1; i < d; ++i) --path[i]->size;
            r->size = p->size - 1;
        }
    }
    for (i = d - 1; i >= 0; --i)
        r_update_min(path[i], path[i]->p[0], path[i]->p[1]);
    while (--d > 0) {
        rnode_t *q = path[d];
        int which, other, b1 = 1, b2 = 2;
        which = dir[d], other = 1 - which;
        if (which) b1 = -b1, b2 = -b2;
        q->balance += b1;
        if (q->balance == b1) break;
        else if (q->balance == b2) {
            rnode_t *r = q->p[other];
            if (r->balance == -b1) {
                path[d - 1]->p[dir[d - 1]] = r_rotate2(q, which);
            } else {
                path[d - 1]->p[dir[d - 1]] = r_rotate1(q, which);
                if (r->balance == 0) {
                    r->balance = -b1;
                    q->balance = b1;
                    break;
                } else r->balance = q->balance = 0;
            }
        }
    }
    *root_ = fake.p[0];
    return p;
}

static rnode_t *r_rmq(rnode_t *root, int32_t lo_y, int64_t lo_i,
                      int32_t hi_y, int64_t hi_i)
{
    const rnode_t *p = root, *path[2][RMQ_MAX_DEPTH], *mn;
    int plen[2] = {0, 0}, pcmp[2][RMQ_MAX_DEPTH], i, cmp, lca;
    if (root == 0) return 0;
    while (p) {
        cmp = rcmp(lo_y, lo_i, p);
        path[0][plen[0]] = p, pcmp[0][plen[0]++] = cmp;
        if (cmp < 0) p = p->p[0];
        else if (cmp > 0) p = p->p[1];
        else break;
    }
    p = root;
    while (p) {
        cmp = rcmp(hi_y, hi_i, p);
        path[1][plen[1]] = p, pcmp[1][plen[1]++] = cmp;
        if (cmp < 0) p = p->p[0];
        else if (cmp > 0) p = p->p[1];
        else break;
    }
    for (i = 0; i < plen[0] && i < plen[1]; ++i)
        if (path[0][i] == path[1][i] && pcmp[0][i] <= 0 && pcmp[1][i] >= 0)
            break;
    if (i == plen[0] || i == plen[1]) return 0;
    lca = i, mn = path[0][lca];
    for (i = lca + 1; i < plen[0]; ++i) {
        if (pcmp[0][i] <= 0) {
            if (path[0][i]->pri < mn->pri) mn = path[0][i];
            if (path[0][i]->p[1] && path[0][i]->p[1]->s->pri < mn->pri)
                mn = path[0][i]->p[1]->s;
        }
    }
    for (i = lca + 1; i < plen[1]; ++i) {
        if (pcmp[1][i] >= 0) {
            if (path[1][i]->pri < mn->pri) mn = path[1][i];
            if (path[1][i]->p[0] && path[1][i]->p[0]->s->pri < mn->pri)
                mn = path[1][i]->p[0]->s;
        }
    }
    return (rnode_t *)mn;
}

/* greatest node <= key */
static rnode_t *r_interval_lo(rnode_t *root, int32_t y, int64_t i)
{
    rnode_t *p = root, *l = 0;
    while (p) {
        int cmp = rcmp(y, i, p);
        if (cmp < 0) p = p->p[0];
        else if (cmp > 0) l = p, p = p->p[1];
        else return p;
    }
    return l;
}

/* in-order predecessor by key */
static rnode_t *r_prev(rnode_t *root, const rnode_t *node)
{
    rnode_t *p = root, *best = 0;
    while (p) {
        int cmp = rcmp(node->y, node->i, p);
        if (cmp <= 0) p = p->p[0];
        else best = p, p = p->p[1];
    }
    return best;
}

/* ----------------------------------------------------------------- */
/* RMQ chaining (mg_lchain_rmq semantics)                             */
/* ----------------------------------------------------------------- */

int64_t mgt_lchain_rmq(int32_t max_dist, int32_t max_dist_inner, int32_t bw,
                       int32_t max_chn_skip, int32_t cap_rmq_size,
                       int32_t min_cnt, int32_t min_sc, float chn_pen_gap,
                       float chn_pen_skip, int64_t n, uint64_t *ax,
                       uint64_t *ay, uint64_t *u_out, int32_t *n_u_out)
{
    int64_t *p, *f, i, i0, st = 0, st_inner = 0, n_v;
    int32_t *t, n_u;
    int64_t *vv;
    rnode_t *root = 0, *root_inner = 0;
    rnode_t *pool;
    int64_t pool_n = 0;
    rnode_t **freelist;
    int64_t nfree = 0;
    int use_inner;
    double gap_d;

    *n_u_out = 0;
    if (n == 0) return 0;
    if (max_dist < bw) max_dist = bw;
    if (max_dist_inner <= 0 || max_dist_inner >= max_dist) max_dist_inner = 0;
    use_inner = max_dist_inner > 0;
    p = (int64_t *)malloc(8 * n);
    f = (int64_t *)malloc(8 * n);
    t = (int32_t *)malloc(4 * n);
    for (i = 0; i < n; ++i) t[i] = -1;
    pool = (rnode_t *)malloc(sizeof(rnode_t) * 2 * (n + 1));
    freelist = (rnode_t **)malloc(sizeof(rnode_t *) * 2 * (n + 1));
    gap_d = (double)chn_pen_gap;

    int64_t n_iter = 0, mmax_f = 0, max_rmq_size = 0;
    int64_t live = 0, max_live = 0;
#define POOL_TAKE() (live++, (live > max_live ? (max_live = live) : 0), \
                     nfree ? freelist[--nfree] : &pool[pool_n++])
#define POOL_FREE(q) (live--, freelist[nfree++] = (q))
    for (i = i0 = 0; i < n; ++i) {
        int64_t max_j = -1;
        int64_t q_span = (int64_t)(ay[i] >> 32 & 0xff), max_f = q_span;
        rnode_t *q;
        if (i0 < i && ax[i0] != ax[i]) {
            int64_t j;
            for (j = i0; j < i; ++j) {
                double pri = -((double)f[j]
                               + 0.5 * gap_d * ((double)(int32_t)ax[j]
                                                + (double)(int32_t)ay[j]));
                q = POOL_TAKE();
                q->y = (int32_t)ay[j], q->i = j, q->pri = pri;
                r_insert(&root, q);
                if (use_inner) {
                    rnode_t *r2 = POOL_TAKE();
                    r2->y = (int32_t)ay[j], r2->i = j, r2->pri = pri;
                    r_insert(&root_inner, r2);
                }
            }
            i0 = i;
        }
        while (st < i && (ax[i] >> 32 != ax[st] >> 32
                          || ax[i] > ax[st] + (uint64_t)max_dist
                          || RSIZE(root) > (uint32_t)cap_rmq_size)) {
            q = r_find(root, (int32_t)ay[st], st);
            if (q) {
                r_erase(&root, q);
                POOL_FREE(q);
            }
            ++st;
        }
        if (use_inner) {
            while (st_inner < i
                   && (ax[i] >> 32 != ax[st_inner] >> 32
                       || ax[i] > ax[st_inner] + (uint64_t)max_dist_inner
                       || RSIZE(root_inner) > (uint32_t)cap_rmq_size)) {
                q = r_find(root_inner, (int32_t)ay[st_inner], st_inner);
                if (q) {
                    r_erase(&root_inner, q);
                    POOL_FREE(q);
                }
                ++st_inner;
            }
        }
        q = r_rmq(root, (int32_t)ay[i] - max_dist, INT32_MAX,
                  (int32_t)ay[i] - 1, 0);
        if (q) {
            int32_t exact, width, n_skip = 0;
            int64_t j = q->i, sc;
            sc = f[j] + comput_sc_simple(ax[i], ay[i], ax[j], ay[j],
                                         chn_pen_gap, chn_pen_skip, &exact,
                                         &width);
            if (width <= bw && sc > max_f) max_f = sc, max_j = j;
            if (!exact && root_inner && (int32_t)ay[i] > 0) {
                rnode_t *lo = r_interval_lo(root_inner, (int32_t)ay[i] - 1, n);
                if (lo) {
                    rnode_t *qq = lo;
                    while (qq) {
                        if (qq->y < (int32_t)ay[i] - max_dist_inner) break;
                        ++n_iter;
                        j = qq->i;
                        sc = f[j] + comput_sc_simple(ax[i], ay[i], ax[j],
                                                     ay[j], chn_pen_gap,
                                                     chn_pen_skip, 0, &width);
                        if (width <= bw) {
                            if (sc > max_f) {
                                max_f = sc, max_j = j;
                                if (n_skip > 0) --n_skip;
                            } else if (t[j] == (int32_t)i) {
                                if (++n_skip > max_chn_skip) break;
                            }
                            if (p[j] >= 0) t[p[j]] = (int32_t)i;
                        }
                        qq = r_prev(root_inner, qq);
                    }
                }
            }
        }
        f[i] = max_f, p[i] = max_j;
        if (mmax_f < max_f) mmax_f = max_f;
        if ((int64_t)RSIZE(root) > max_rmq_size)
            max_rmq_size = (int64_t)RSIZE(root);
    }
    mgt_lchain_stats[0] = n_iter;
    mgt_lchain_stats[1] = mmax_f;
    mgt_lchain_stats[2] = max_rmq_size;
    mgt_lchain_stats[3] = max_live;

    vv = (int64_t *)malloc(8 * n);
    n_v = chain_backtrack(n, f, p, min_cnt, min_sc, bw, u_out, &n_u, vv);
    if (n_u > 0) compact_a(n_u, u_out, n_v, vv, ax, ay);
    free(p); free(f); free(t); free(vv); free(pool); free(freelist);
    *n_u_out = n_u;
    return n_u == 0 ? 0 : n_v;
}
