"""Batched (w,k)-minimizer sketching on device.

A lax.scan over base positions carries the same state machine as the
host sketch (sketch.c:56-109): rolling w-slot buffer, current window
minimum, run length since the last ambiguous base.  Emissions (the old
minimum, plus tie copies in rotated buffer order) are scattered into a
fixed-capacity output buffer; records and order match the host sketch
exactly.  Batched over reads with vmap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device import hash64_jnp

U64MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)

NT4_NP = np.full(256, 4, dtype=np.uint8)
NT4_NP[:4] = [0, 1, 2, 3]
for _c, _v in zip("ACGTU", [0, 1, 2, 3, 3]):
    NT4_NP[ord(_c)] = _v
    NT4_NP[ord(_c.lower())] = _v


def encode_batch(seqs, pad_to=None):
    """Encode reads to (B, L) nt4 codes + lengths (padding = 4/ambiguous)."""
    L = pad_to or max(len(s) for s in seqs)
    B = len(seqs)
    codes = np.full((B, L), 4, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = s.encode("latin-1") if isinstance(s, str) else s
        codes[i, : len(b)] = NT4_NP[np.frombuffer(b, dtype=np.uint8)]
        lens[i] = len(b)
    return jnp.asarray(codes), jnp.asarray(lens)


@partial(jax.jit, static_argnames=("w", "k", "cap"))
def sketch_device(codes, lens, w: int, k: int, cap: int, rid=None):
    """Minimizers of a batch of reads.

    codes: (B, L) uint8 nt4; lens: (B,) int32.
    Returns (x, y, n): (B, cap) uint64 record arrays + per-read counts.
    Padding positions (code 4) behave as ambiguous bases, which only
    reset state, so per-read results equal the host sketch of seq[:len].
    """
    B, L = codes.shape
    if rid is None:
        rid = jnp.zeros(B, dtype=jnp.uint64)
    shift1 = jnp.uint64(2 * (k - 1))
    mask = jnp.uint64((1 << (2 * k)) - 1)
    rot = jnp.arange(w, dtype=jnp.int32)

    def one_read(code_row, n_len, rid1):
        def step(carry, inp):
            (kf, kr, l, bufx, bufy, buf_pos, mnx, mny, min_pos,
             outx, outy, cur) = carry
            c, i = inp
            c64 = c.astype(jnp.uint64)
            in_range = i < n_len
            valid = (c < 4) & in_range

            kmer_span = jnp.minimum(l + 1, k)
            kf_new = jnp.where(valid, ((kf << jnp.uint64(2)) | c64) & mask, kf)
            kr_new = jnp.where(
                valid,
                (kr >> jnp.uint64(2))
                | ((jnp.uint64(3) ^ c64) << shift1), kr)
            sym = valid & (kf_new == kr_new)
            # symmetric k-mers skip the slot entirely; ambiguous in-range
            # bases reset the run but still write the buffer and run the
            # window rules (sketch.c:81-105)
            l_new = jnp.where(valid, jnp.where(sym, l, l + 1),
                              jnp.where(in_range, jnp.int32(0), l))
            span_new = jnp.where(valid, kmer_span,
                                 jnp.where(in_range, jnp.int32(0),
                                           kmer_span))
            act = in_range & ~sym  # this position writes the buffer

            z = (kf_new >= kr_new).astype(jnp.uint64)
            canon = jnp.where(z == 0, kf_new, kr_new)
            has_info = valid & ~sym & (l_new >= k) & (span_new < 256)
            info_x = jnp.where(
                has_info,
                (hash64_jnp(canon, mask) << jnp.uint64(8))
                | span_new.astype(jnp.uint64), U64MAX)
            info_y = jnp.where(
                has_info,
                (rid1 << jnp.uint64(32))
                | (((i.astype(jnp.uint64) << jnp.uint64(1)) | z)
                   & jnp.uint64(0xFFFFFFFF)), U64MAX)

            bufx = jnp.where(act, bufx.at[buf_pos].set(info_x), bufx)
            bufy = jnp.where(act, bufy.at[buf_pos].set(info_y), bufy)

            order = (buf_pos + 1 + rot) % w  # rotated scan order

            # --- first-window tie emissions (j != buf_pos) ---
            fw = act & (l_new == w + k - 1) & (mnx != U64MAX)
            fw_sel = order[:-1]  # excludes buf_pos (the last in rotation)
            fw_mask = fw & (bufx[fw_sel] == mnx) & (bufy[fw_sel] != mny)

            # --- rule A: new minimum ---
            new_min = act & (info_x <= mnx)
            emitA = new_min & (l_new >= w + k) & (mnx != U64MAX)

            # --- rule B: old minimum left the window ---
            ruleB = act & ~new_min & (buf_pos == min_pos)
            emitB_old = ruleB & (l_new >= w + k - 1) & (mnx != U64MAX)
            # rescan for the new minimum: last tied entry in rotated order
            bx_rot = bufx[order]
            m = jnp.min(bx_rot)
            last_rot = (w - 1) - jnp.argmax(bx_rot[::-1] == m)
            rmn_pos = order[last_rot]
            rmnx = bufx[rmn_pos]
            rmny = bufy[rmn_pos]
            emitB_ties = (ruleB & (l_new >= w + k - 1) & (rmnx != U64MAX)) \
                & (bx_rot == rmnx) & (bufy[order] != rmny)

            # ---- gather all emissions for this step, in order ----
            em_x = jnp.concatenate([
                bufx[fw_sel], mnx[None], mnx[None], bufx[order]])
            em_y = jnp.concatenate([
                bufy[fw_sel], mny[None], mny[None], bufy[order]])
            em_m = jnp.concatenate([
                fw_mask, emitA[None], emitB_old[None], emitB_ties])
            pos = (cur + jnp.cumsum(em_m.astype(jnp.int32))
                   - em_m.astype(jnp.int32)).astype(jnp.int32)
            pos = jnp.where(em_m, pos, cap)  # dropped when masked
            outx = outx.at[pos].set(em_x, mode="drop")
            outy = outy.at[pos].set(em_y, mode="drop")
            cur = (cur + jnp.sum(em_m.astype(jnp.int32))).astype(jnp.int32)

            # ---- update the minimum ----
            mnx2 = jnp.where(new_min, info_x, jnp.where(ruleB, rmnx, mnx))
            mny2 = jnp.where(new_min, info_y, jnp.where(ruleB, rmny, mny))
            min_pos2 = jnp.where(new_min, buf_pos,
                                 jnp.where(ruleB, rmn_pos, min_pos))
            buf_pos2 = jnp.where(act, (buf_pos + 1) % w, buf_pos)
            return ((kf_new, kr_new, l_new, bufx, bufy, buf_pos2,
                     mnx2, mny2, min_pos2, outx, outy, cur), None)

        init = (jnp.uint64(0), jnp.uint64(0), jnp.int32(0),
                jnp.full(w, U64MAX, dtype=jnp.uint64),
                jnp.full(w, U64MAX, dtype=jnp.uint64),
                jnp.int32(0), U64MAX, U64MAX, jnp.int32(0),
                jnp.full(cap, U64MAX, dtype=jnp.uint64),
                jnp.full(cap, U64MAX, dtype=jnp.uint64),
                jnp.int32(0))
        idxs = jnp.arange(L, dtype=jnp.int32)
        carry, _ = jax.lax.scan(step, init, (code_row, idxs))
        (_, _, _, _, _, _, mnx, mny, _, outx, outy, cur) = carry
        # final emission of the last window minimum
        final = mnx != U64MAX
        outx = outx.at[jnp.where(final, cur, cap)].set(mnx, mode="drop")
        outy = outy.at[jnp.where(final, cur, cap)].set(mny, mode="drop")
        cur = (cur + final.astype(jnp.int32)).astype(jnp.int32)
        return outx, outy, cur

    return jax.vmap(one_read)(codes, lens, rid)
