/* Graph-chaining DP engine (semantics of mg_gchain1_dp,
 * gchain1.c:62-240), one call per read.  The DP walks linear chains
 * sorted by (isolated, qe), collects candidate predecessors with the
 * reference's find_max window, resolves graph reachability through
 * this repo's mgt_shortest_k engine, and backtracks with the shared
 * peak-cut walker (native/mgt_lchain.c).  Tie permutations reuse the
 * reference-exact 128-bit radix sorter so results stay byte-identical
 * to the Python path in mapping/gchain.py.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

extern void mgt_radix_sort_128x(uint64_t *a, int64_t n);
extern int64_t mgt_chain_backtrack_core(int64_t n, const int64_t *f,
                                        const int64_t *p, int32_t min_cnt,
                                        int32_t min_sc, int32_t max_drop,
                                        uint64_t *u, int32_t *n_u_,
                                        int64_t *v);
extern int64_t mgt_shortest_k(
    const int64_t *gidx, const int64_t *arc_w, const int64_t *arc_lv,
    const int64_t *arc_rank, int64_t n_vtx, int64_t src, int64_t max_dist,
    int64_t max_k, int64_t want_path, int64_t n_dst, const int64_t *dst_v,
    const int64_t *dst_target_dist, const uint32_t *dst_target_hash,
    const int64_t *dst_check_hash, const int64_t *dst_inner,
    int64_t *out_n_path, int64_t *out_dist, uint32_t *out_hash,
    int64_t *out_is0, int64_t *out_path_end, int64_t path_cap, int64_t *pv_v,
    int64_t *pv_d, int64_t *pv_pre);

#define GC_INT32_MIN (-0x7fffffff - 1)

static inline float mg_log2f(float x)
{
    union { float f; uint32_t i; } z = { x };
    float log_2 = (float)(int32_t)(((z.i >> 23) & 255) - 128);
    z.i &= ~(255u << 23);
    z.i += 127u << 23;
    log_2 += (-0.34484843f * z.f + 2.02466578f) * z.f - 0.67487759f;
    return log_2;
}

/* gap between consecutive lchains through the graph
 * (mg_target_dist, gchain1.c:31-36) */
static inline int64_t target_dist(const int64_t *seg_len, const int64_t *lv,
                                  const int64_t *lqs, const int64_t *lqe,
                                  const int64_t *lrs, const int64_t *lre,
                                  int64_t j, int64_t i)
{
    return (lqs[i] - lqe[j]) - (seg_len[lv[j] >> 1] - lre[j])
        + (seg_len[lv[i] >> 1] - lrs[i]);
}

/* transition score (cal_sc, gchain1.c:38-60) */
static inline int64_t cal_sc(int64_t dist, int64_t tdist, int64_t is_0,
                             int64_t li, int64_t lj, const uint64_t *ay,
                             const int64_t *loff, const int64_t *lcnt,
                             const int64_t *lscore, const int64_t *lqs,
                             const int64_t *lqe, int64_t fj, int64_t bw,
                             int64_t ref_bonus, double chn_pen_gap)
{
    int64_t segi = (int64_t)(ay[loff[li]] >> 48 & 0xff);
    int64_t segj = (int64_t)(ay[loff[lj] + lcnt[lj] - 1] >> 48 & 0xff);
    int64_t gap = dist - tdist, sc;
    float lin_pen, log_pen;
    if (gap < 0) gap = -gap;
    if (segi == segj && gap > bw) return GC_INT32_MIN;
    if (lqe[lj] <= lqs[li]) sc = lscore[li];
    else
        sc = (int64_t)((double)(lqe[li] - lqe[lj])
                       / (double)(lqe[li] - lqs[li])
                       * (double)lscore[li] + .499);
    if (is_0) sc += ref_bonus;
    lin_pen = (float)chn_pen_gap * (float)gap;
    log_pen = gap >= 2 ? mg_log2f((float)gap) : 0.0f;
    sc -= (int64_t)(lin_pen + log_pen);
    sc += fj;
    return sc;
}

/* Returns n_u (number of graph chains); u_out[c] = score<<32|n_lc,
 * order_out[] = original lchain index per slot in gchain layout.
 * dist_pre/hash_pre/inner_pre are per ORIGINAL lchain index.
 * Returns -1 on allocation failure (caller falls back to Python). */
int64_t mgt_gchain1_dp(
    /* graph */
    const int64_t *gidx, const int64_t *arc_w, const int64_t *arc_lv,
    const int64_t *arc_rank, int64_t n_vtx, const int64_t *seg_len,
    /* linear chains */
    int64_t n_lc, const int64_t *lv, const int64_t *loff,
    const int64_t *lcnt, const int64_t *lscore, const int64_t *lqs,
    const int64_t *lqe, const int64_t *lrs, const int64_t *lre,
    const uint64_t *ay,
    /* params */
    int64_t qlen, int64_t max_dist_g, int64_t max_dist_q, int64_t bw,
    int64_t max_skip, int64_t ref_bonus, double chn_pen_gap,
    double mask_level, int64_t max_sk,
    /* out */
    uint64_t *u_out, int64_t *order_out, int64_t *dist_pre,
    uint32_t *hash_pre, int64_t *inner_pre)
{
    int64_t i, j, k, n_ext = 0, n_u = 0, n_v, ret = -1;
    int32_t n_u32 = 0;
    uint64_t *z = 0, *u_bt = 0;
    int64_t *a_i = 0, *f = 0, *p = 0, *t = 0, *vv = 0;
    int64_t *dv = 0, *dtd = 0, *dch = 0, *din = 0, *dmeta = 0;
    uint32_t *dth = 0;
    int64_t *onp = 0, *odi = 0, *oi0 = 0, *ope = 0;
    uint32_t *oha = 0;
    int64_t pvd[1] = { 0 };

    if (n_lc <= 0) return 0;
    z = (uint64_t *)malloc(16 * (size_t)n_lc);
    a_i = (int64_t *)malloc(8 * (size_t)n_lc);
    if (!z || !a_i) goto done;
    for (i = 0; i < n_lc; ++i) {
        int64_t med = seg_len[lv[i] >> 1] - lre[i], iso;
        dist_pre[i] = -1, hash_pre[i] = 0, inner_pre[i] = 0;
        if (lrs[i] < med) med = lrs[i];
        iso = (med > max_dist_g || (med >> 3) > lscore[i]) ? 1 : 0;
        z[2 * i] = (uint64_t)(uint32_t)((iso << 31) | (uint32_t)lqe[i]);
        z[2 * i + 1] = (uint64_t)i;
        if (!iso) ++n_ext;
    }
    if (n_ext < 2) {
        for (i = 0; i < n_lc; ++i) {
            u_out[i] = (uint64_t)lscore[i] << 32 | 1;
            order_out[i] = i;
        }
        ret = n_lc;
        goto done;
    }
    mgt_radix_sort_128x(z, n_lc);
    for (i = 0; i < n_lc; ++i) a_i[i] = (int64_t)z[2 * i + 1];

    f = (int64_t *)malloc(8 * (size_t)n_ext);
    p = (int64_t *)malloc(8 * (size_t)n_ext);
    t = (int64_t *)malloc(8 * (size_t)n_ext);
    vv = (int64_t *)malloc(8 * (size_t)n_lc);
    u_bt = (uint64_t *)malloc(8 * (size_t)n_lc);
    dv = (int64_t *)malloc(8 * (size_t)n_ext);
    dtd = (int64_t *)malloc(8 * (size_t)n_ext);
    dch = (int64_t *)calloc((size_t)n_ext, 8);
    din = (int64_t *)malloc(8 * (size_t)n_ext);
    dmeta = (int64_t *)malloc(8 * (size_t)n_ext);
    dth = (uint32_t *)calloc((size_t)n_ext, 4);
    onp = (int64_t *)malloc(8 * (size_t)n_ext);
    odi = (int64_t *)malloc(8 * (size_t)n_ext);
    oi0 = (int64_t *)malloc(8 * (size_t)n_ext);
    ope = (int64_t *)malloc(8 * (size_t)n_ext);
    oha = (uint32_t *)malloc(4 * (size_t)n_ext);
    if (!f || !p || !t || !vv || !u_bt || !dv || !dtd || !dch || !din
        || !dmeta || !dth || !onp || !odi || !oi0 || !ope || !oha)
        goto done;
    for (i = 0; i < n_ext; ++i) t[i] = -1;

    for (i = 0; i < n_ext; ++i) {
        const int64_t li = a_i[i];
        const int64_t segi = (int64_t)(ay[loff[li]] >> 48 & 0xff);
        uint64_t x = (uint64_t)(lqs[li] + bw > qlen ? qlen : lqs[li] + bw);
        int64_t xj, n_dst = 0, n_skip = 0, rsk;
        int64_t max_f = lscore[li], max_j = -1, max_d = -1, max_inner = 0;
        uint32_t max_hash = 0;
        /* find_max (gchain1.c:16-29), n = i over sorted srt keys */
        if (i == 0) xj = -1;
        else if (z[2 * (i - 1)] < x) xj = i - 1;
        else if (z[0] >= x) xj = -1;
        else {
            int64_t s = 0, e = i, m;
            while (e > s) {
                m = s + (e - s) / 2;
                if (z[2 * m] >= x) e = m;
                else s = m + 1;
            }
            xj = s;
        }
        for (j = xj; j >= 0; --j) {
            const int64_t lj = a_i[j];
            int64_t dq, segj, td;
            if (lqs[lj] >= lqs[li]) continue;
            if (lqe[lj] > lqs[li]) {
                int64_t o = lqe[lj] - lqs[li];
                if ((double)o > (double)(lqe[lj] - lqs[lj]) * mask_level
                    || (double)o > (double)(lqe[li] - lqs[li]) * mask_level)
                    continue;
            }
            dq = lqs[li] - lqe[lj];
            segj = (int64_t)(ay[loff[lj] + lcnt[lj] - 1] >> 48 & 0xff);
            if (segi == segj) {
                if (dq > max_dist_q) break;
            } else if (dq > max_dist_g && dq > max_dist_q) {
                break;
            }
            if (lv[li] != lv[lj]) {
                int64_t min_dist = lrs[li] + (seg_len[lv[lj] >> 1] - lre[lj]);
                if (min_dist > max_dist_g) continue;
                if (segi == segj && min_dist - bw > lqs[li] - lqe[lj])
                    continue;
                td = target_dist(seg_len, lv, lqs, lqe, lrs, lre, lj, li);
                if (td < 0) continue;
            } else if (lrs[lj] >= lrs[li] || lre[lj] >= lre[li]) {
                continue;
            } else {
                int64_t dr = lrs[li] - lre[lj];
                int64_t w = dr > dq ? dr - dq : dq - dr;
                if (segi == segj && w > bw) continue;
                if (dr > max_dist_g || dr < -max_dist_g) continue;
                if (lre[lj] > lrs[li]) {
                    int64_t o = lre[lj] - lrs[li];
                    if ((double)o > (double)(lre[lj] - lrs[lj]) * mask_level
                        || (double)o > (double)(lre[li] - lrs[li])
                            * mask_level)
                        continue;
                }
                td = target_dist(seg_len, lv, lqs, lqe, lrs, lre, lj, li);
            }
            din[n_dst] = (lv[li] == lv[lj]) ? 1 : 0;
            dv[n_dst] = lv[lj] ^ 1;
            dmeta[n_dst] = j;
            dtd[n_dst] = td;
            ++n_dst;
            if (t[j] == i) {
                if (++n_skip > max_skip) break;
            }
            if (p[j] >= 0) t[p[j]] = i;
        }
        rsk = mgt_shortest_k(
            gidx, arc_w, arc_lv, arc_rank, n_vtx, lv[li] ^ 1,
            max_dist_g + (seg_len[lv[li] >> 1] - lrs[li]), max_sk, 0,
            n_dst, dv, dtd, dth, dch, din,
            onp, odi, oha, oi0, ope, 0, pvd, pvd, pvd);
        if (rsk == -3) goto done;   /* engine overflow: Python fallback */
        for (k = 0; k < n_dst; ++k) {
            int64_t sc;
            if (onp[k] == 0) continue;
            sc = cal_sc(odi[k], dtd[k], oi0[k], li, a_i[dmeta[k]], ay, loff,
                        lcnt, lscore, lqs, lqe, f[dmeta[k]], bw, ref_bonus,
                        chn_pen_gap);
            if (sc == GC_INT32_MIN) continue;
            if (sc + lscore[li] < 0) continue;
            if (sc > max_f) {
                max_f = sc, max_j = dmeta[k];
                max_d = odi[k], max_hash = oha[k], max_inner = din[k];
            }
        }
        f[i] = max_f, p[i] = max_j;
        dist_pre[li] = max_d;
        hash_pre[li] = max_hash;
        inner_pre[li] = max_inner;
    }

    n_v = mgt_chain_backtrack_core(n_ext, f, p, 0, 0, 0x7fffffff, u_bt,
                                   &n_u32, vv);
    n_u = n_u32;
    for (i = 0; i < n_lc - n_ext; ++i) {
        u_bt[n_u + i] = (uint64_t)lscore[a_i[n_ext + i]] << 32 | 1;
        vv[n_v + i] = n_ext + i;
    }
    n_u += n_lc - n_ext;
    n_v += n_lc - n_ext;
    /* gchain layout: chains in u order, each chain's lchains reversed */
    k = 0;
    for (i = 0; i < n_u; ++i) {
        int64_t ni = (int64_t)(uint32_t)u_bt[i], k0 = k;
        u_out[i] = u_bt[i];
        for (j = 0; j < ni; ++j) order_out[k++] = a_i[vv[k0 + ni - 1 - j]];
    }
    ret = n_u;
done:
    free(z); free(a_i); free(f); free(p); free(t); free(vv); free(u_bt);
    free(dv); free(dtd); free(dch); free(din); free(dmeta); free(dth);
    free(onp); free(odi); free(oi0); free(ope); free(oha);
    return ret;
}

extern void mgt_chain_filters(const uint64_t *ax, uint64_t *ay,
                              int32_t lc_max_occ, int32_t lc_max_trim,
                              int32_t score, int32_t bw, int32_t min_match,
                              int32_t max_gap_half, int64_t *off_io,
                              int64_t *cnt_io);

/* Fused post-DP linear-chain tail, one call per read:
 * mg_lchain_gen (lchain.c:374-408) + the per-chain filter block
 * (map-algo.c:194-330 via mgt_chain_filters) + mg_update_anchors
 * (lchain.c:424-441).  ax/ay are mutated in place (anchor x rewrite,
 * seed flags).  Fills the kept chains' table arrays; returns n_kept,
 * or -1 on allocation failure. */
int64_t mgt_lchain_tail(
    int64_t qlen, int64_t n_u, const uint64_t *u, uint64_t *ax,
    uint64_t *ay, const int64_t *mini_pos, int64_t n_mv,
    /* filter params */
    int64_t lc_max_occ, int64_t lc_max_trim, int64_t bw,
    int64_t max_gap_half, int64_t min_lc_cnt,
    /* out tables (cap n_u) */
    int64_t *t_off, int64_t *t_cnt, int64_t *t_v, int64_t *t_rs,
    int64_t *t_re, int64_t *t_qs, int64_t *t_qe, int64_t *t_score)
{
    int64_t i, k, n_out = 0;
    uint64_t *z;
    (void)qlen;
    if (n_u <= 0) return 0;
    z = (uint64_t *)malloc(16 * (size_t)n_u);
    if (!z) return -1;
    for (i = 0, k = 0; i < n_u; ++i) {
        int64_t span = (int64_t)(ay[k] >> 32 & 0xff);
        int64_t qs = (int32_t)(uint32_t)ay[k] + 1 - span;
        z[2 * i] = (uint64_t)qs << 32 | (u[i] >> 32);
        z[2 * i + 1] = (uint64_t)k << 32 | (uint64_t)(uint32_t)u[i];
        k += (int64_t)(uint32_t)u[i];
    }
    mgt_radix_sort_128x(z, n_u);
    for (i = 0; i < n_u; ++i) {
        int64_t off = (int64_t)(z[2 * i + 1] >> 32);
        int64_t cnt = (int64_t)(uint32_t)z[2 * i + 1];
        int64_t score = (int64_t)(uint32_t)z[2 * i];
        int64_t q_span = (int64_t)(ay[off] >> 32 & 0xff);
        int64_t rs, re, qs, qe, v;
        v = (int64_t)(ax[off] >> 32);
        rs = (int32_t)(uint32_t)ax[off] + 1 - q_span;
        if (rs < 0) rs = 0;
        qs = (int64_t)(z[2 * i] >> 32);
        re = (int32_t)(uint32_t)ax[off + cnt - 1] + 1;
        qe = (int32_t)(uint32_t)ay[off + cnt - 1] + 1;
        if (n_u > 1) {
            /* the mapper's per-chain filter block (map-algo.c tail) */
            mgt_chain_filters(ax, ay, (int32_t)lc_max_occ,
                              (int32_t)lc_max_trim, (int32_t)score,
                              (int32_t)bw, 100, (int32_t)max_gap_half,
                              &off, &cnt);
            if (cnt < min_lc_cnt) continue;
            q_span = (int64_t)(ay[off] >> 32 & 0xff);
            rs = (int32_t)(uint32_t)ax[off] + 1 - q_span;
            qs = (int32_t)(uint32_t)ay[off] + 1 - q_span;
            re = (int32_t)(uint32_t)ax[off + cnt - 1] + 1;
            qe = (int32_t)(uint32_t)ay[off + cnt - 1] + 1;
        }
        t_off[n_out] = off, t_cnt[n_out] = cnt, t_v[n_out] = v;
        t_rs[n_out] = rs, t_re[n_out] = re;
        t_qs[n_out] = qs, t_qe[n_out] = qe;
        t_score[n_out] = score;
        ++n_out;
    }
    free(z);
    /* mg_update_anchors: rewrite anchor x to mini_idx<<32|tpos */
    for (i = 0; i < n_out; ++i) {
        int64_t a;
        for (a = t_off[i]; a < t_off[i] + t_cnt[i]; ++a) {
            int64_t qpos = (int32_t)(uint32_t)ay[a];
            int64_t s = 0, e = n_mv;
            while (e > s) {     /* lower_bound over mini_pos */
                int64_t m = s + (e - s) / 2;
                if (mini_pos[m] < qpos) s = m + 1;
                else e = m;
            }
            ax[a] = (uint64_t)s << 32 | (ax[a] & 0xffffffffULL);
        }
    }
    return n_out;
}
