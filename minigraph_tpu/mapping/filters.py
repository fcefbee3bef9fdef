"""Per-lchain end trimming and bad-seed masking (map-algo.c:194-330)."""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..options import MG_SEED_FIXED, MG_SEED_IGNORE

U64 = np.uint64


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def fix_bad_ends(ax, ay, lc_max_occ: int, lc_max_trim: int,
                 as_: int, cnt: int) -> Tuple[int, int]:
    """Trim chain ends made of high-occurrence seeds (map-algo.c:194)."""
    as0, cnt0 = as_, cnt
    k = 0
    i = as0 + cnt0 - 1
    while k < lc_max_trim and k < cnt0:
        if (int(ay[i]) >> 56) <= lc_max_occ:
            break
        k += 1
        i -= 1
    cnt -= k
    k = 0
    i = as0
    while k < cnt and k < lc_max_trim:
        if (int(ay[i]) >> 56) <= lc_max_occ:
            break
        i += 1
        k += 1
    return as_ + k, cnt - k


def fix_bad_ends_alt(ax, ay, score: int, bw: int, min_match: int,
                     as_: int, cnt: int) -> Tuple[int, int]:
    """Score-based end shrink (map-algo.c:207-238)."""
    as0, cnt0 = as_, cnt
    if cnt0 < 3:
        return as_, cnt
    m = l = (int(ay[as0]) >> 32) & 0xFF
    for i in range(as0 + 1, as0 + cnt0 - 1):
        q_span = (int(ay[i]) >> 32) & 0xFF
        lr = _i32(int(ax[i])) - _i32(int(ax[i - 1]))
        lq = _i32(int(ay[i])) - _i32(int(ay[i - 1]))
        mn, mx = (lr, lq) if lr < lq else (lq, lr)
        if mx - mn > (l >> 1):
            as_ = i
        l += mn
        m += mn if mn < q_span else q_span
        if l >= bw << 1 or (m >= min_match and m >= bw) or m >= score >> 1:
            break
    cnt = as0 + cnt0 - as_
    m = l = (int(ay[as0 + cnt0 - 1]) >> 32) & 0xFF
    for i in range(as0 + cnt0 - 2, as_, -1):
        q_span = (int(ay[i + 1]) >> 32) & 0xFF
        lr = _i32(int(ax[i + 1])) - _i32(int(ax[i]))
        lq = _i32(int(ay[i + 1])) - _i32(int(ay[i]))
        mn, mx = (lr, lq) if lr < lq else (lq, lr)
        if mx - mn > (l >> 1):
            cnt = i + 1 - as_
        l += mn
        m += mn if mn < q_span else q_span
        if l >= bw << 1 or (m >= min_match and m >= bw) or m >= score >> 1:
            break
    return as_, cnt


def _collect_long_gaps(as1: int, cnt1: int, ax, ay, min_gap: int):
    K = []
    for i in range(1, cnt1):
        gap = (_i32(int(ay[as1 + i])) - _i32(int(ay[as1 + i - 1]))) \
            - (_i32(int(ax[as1 + i])) - _i32(int(ax[as1 + i - 1])))
        if gap < -min_gap or gap > min_gap:
            K.append(i)
    if len(K) <= 1:
        return None
    return K


def filter_bad_seeds(as1: int, cnt1: int, ax, ay, min_gap: int,
                     diff_thres: int, max_ext_len: int, max_ext_cnt: int) -> None:
    """Mask seeds inside unbalanced indel clusters (map-algo.c:259-294)."""
    K = _collect_long_gaps(as1, cnt1, ax, ay, min_gap)
    if K is None:
        return
    n = len(K)
    mx = 0
    max_st = max_en = -1
    k = 0
    while True:
        if k == n or k >= max_en:
            if max_en > 0:
                for i in range(K[max_st], K[max_en]):
                    ay[as1 + i] = U64(int(ay[as1 + i]) | MG_SEED_IGNORE)
            mx = 0
            max_st = max_en = -1
            if k == n:
                break
        i = K[k]
        gap = (_i32(int(ay[as1 + i])) - _i32(int(ay[as1 + i - 1]))) \
            - (_i32(int(ax[as1 + i])) - _i32(int(ax[as1 + i - 1])))
        n_ins = gap if gap > 0 else 0
        n_del = -gap if gap <= 0 else 0
        qs = _i32(int(ay[as1 + i - 1]))
        rs = _i32(int(ax[as1 + i - 1]))
        max_diff = 0
        max_diff_l = -1
        l = k + 1
        while l < n and l <= k + max_ext_cnt:
            j = K[l]
            if _i32(int(ay[as1 + j])) - qs > max_ext_len \
                    or _i32(int(ax[as1 + j])) - rs > max_ext_len:
                break
            gap = (_i32(int(ay[as1 + j])) - _i32(int(ay[as1 + j - 1]))) \
                - (_i32(int(ax[as1 + j])) - _i32(int(ax[as1 + j - 1])))
            if gap > 0:
                n_ins += gap
            else:
                n_del += -gap
            diff = n_ins + n_del - abs(n_ins - n_del)
            if max_diff < diff:
                max_diff = diff
                max_diff_l = l
            l += 1
        if max_diff > diff_thres and max_diff > mx:
            mx = max_diff
            max_st = k
            max_en = max_diff_l
        k += 1


def filter_bad_seeds_alt(as1: int, cnt1: int, ax, ay, min_gap: int,
                         max_ext: int) -> None:
    """Mask seeds between compensating gaps (map-algo.c:296-330)."""
    K = _collect_long_gaps(as1, cnt1, ax, ay, min_gap)
    if K is None:
        return
    n = len(K)
    k = 0
    while k < n:
        i = K[k]
        gap1 = (_i32(int(ay[as1 + i])) - _i32(int(ay[as1 + i - 1]))) \
            - (_i32(int(ax[as1 + i])) - _i32(int(ax[as1 + i - 1])))
        re1 = _i32(int(ax[as1 + i]))
        qe1 = _i32(int(ay[as1 + i]))
        gap1 = gap1 if gap1 > 0 else -gap1
        l = k + 1
        while l < n:
            j = K[l]
            if _i32(int(ay[as1 + j])) - qe1 > max_ext \
                    or _i32(int(ax[as1 + j])) - re1 > max_ext:
                break
            gap2 = (_i32(int(ay[as1 + j])) - _i32(int(ay[as1 + j - 1]))) \
                - (_i32(int(ax[as1 + j])) - _i32(int(ax[as1 + j - 1])))
            q_span_pre = (int(ay[as1 + j - 1]) >> 32) & 0xFF
            rs2 = _i32(int(ax[as1 + j - 1])) + q_span_pre
            qs2 = _i32(int(ay[as1 + j - 1])) + q_span_pre
            m = min(rs2 - re1, qs2 - qe1)
            gap2 = gap2 if gap2 > 0 else -gap2
            if m > gap1 + gap2:
                break
            re1 = _i32(int(ax[as1 + j]))
            qe1 = _i32(int(ay[as1 + j]))
            gap1 = gap2
            l += 1
        if l > k + 1:
            end = K[l - 1]
            for j in range(K[k], end):
                ay[as1 + j] = U64(int(ay[as1 + j]) | MG_SEED_IGNORE)
            ay[as1 + end] = U64(int(ay[as1 + end]) | MG_SEED_FIXED)
        k = l
