"""Deterministic synthetic pangenome generator (MHC-class workloads).

The real minigraph cookbook (reference README.md:142-163) builds a
61-haplotype human-MHC graph (~5 Mb) with `-cxggs`, then calls per-
sample bubble alleles with `-cxasm --call` and merges them to a VCF.
The Zenodo tarball is unavailable in this environment, so this module
generates an MHC-like region instead: a multi-Mb reference with
interspersed diverged repeat families (so the minimizer occurrence
spectrum has a heavy tail like real sequence), plus haplotypes carrying
structural variants (deletions, insertions, tandem duplications,
inversions) over a SNP/indel background — the same variant classes
minigraph's graph construction targets (ggsimple.c).

Everything is seeded and platform-independent: tests and bench.py can
regenerate identical inputs anywhere.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = {65: 84, 67: 71, 71: 67, 84: 65, 78: 78}
_CMP_TBL = np.arange(256, dtype=np.uint8)
for _k, _v in _COMP.items():
    _CMP_TBL[_k] = _v


def _rand_seq(rng: np.random.Generator, n: int) -> np.ndarray:
    return BASES[rng.integers(0, 4, n)]


def _revcomp(a: np.ndarray) -> np.ndarray:
    return _CMP_TBL[a[::-1]]


def _mutate(rng: np.random.Generator, a: np.ndarray, sub: float,
            indel: float = 0.0) -> np.ndarray:
    """Substitutions + small (1-10 bp) indels at the given rates."""
    a = a.copy()
    n_sub = rng.binomial(len(a), sub)
    if n_sub:
        pos = rng.integers(0, len(a), n_sub)
        a[pos] = BASES[(np.searchsorted(BASES, a[pos]) % 4
                        + rng.integers(1, 4, n_sub)) % 4]
    if indel <= 0:
        return a
    n_ind = rng.binomial(len(a), indel)
    if not n_ind:
        return a
    parts = []
    cuts = np.sort(rng.integers(0, len(a), n_ind))
    prev = 0
    for c in cuts.tolist():
        parts.append(a[prev:c])
        ln = int(rng.integers(1, 11))
        if rng.random() < 0.5:
            parts.append(_rand_seq(rng, ln))      # insertion
            prev = c
        else:
            prev = min(len(a), c + ln)            # deletion
    parts.append(a[prev:])
    return np.concatenate(parts)


def make_reference(length: int, seed: int = 0,
                   repeat_frac: float = 0.3) -> str:
    """MHC-like reference: unique blocks + diverged repeat copies."""
    rng = np.random.default_rng(seed)
    lib: List[np.ndarray] = []
    parts: List[np.ndarray] = []
    total = 0
    while total < length:
        if lib and rng.random() < repeat_frac:
            unit = lib[int(rng.integers(0, len(lib)))]
            block = _mutate(rng, unit, float(rng.uniform(0.03, 0.15)))
        else:
            block = _rand_seq(rng, int(rng.integers(500, 5000)))
            if rng.random() < 0.4 and 300 <= len(block) <= 3000:
                lib.append(block)
            if len(lib) > 40:
                lib.pop(0)
        parts.append(block)
        total += len(block)
    return np.concatenate(parts)[:length].tobytes().decode("latin-1")


def make_haplotype(ref: str, seed: int, sv_per_mb: float = 12.0,
                   snp: float = 0.001, small_indel: float = 0.0001) -> str:
    """A haplotype with SVs (del/ins/dup/inv) over a SNP/indel layer."""
    rng = np.random.default_rng(seed)
    a = np.frombuffer(ref.encode("latin-1"), dtype=np.uint8)
    n_sv = max(1, int(len(a) / 1e6 * sv_per_mb))
    # non-overlapping SV positions, left to right
    pos = np.sort(rng.integers(1000, max(2000, len(a) - 20000), n_sv))
    parts = []
    prev = 0
    for p in pos.tolist():
        if p < prev:
            continue
        parts.append(a[prev:p])
        kind = rng.choice(["del", "ins", "dup", "inv"],
                          p=[0.35, 0.35, 0.15, 0.15])
        if kind == "del":
            prev = p + int(rng.integers(60, 5000))
        elif kind == "ins":
            if rng.random() < 0.5:        # novel sequence
                parts.append(_rand_seq(rng, int(rng.integers(60, 5000))))
            else:                         # mobile-element-like copy
                src = int(rng.integers(0, len(a) - 3000))
                ln = int(rng.integers(100, 3000))
                parts.append(_mutate(rng, a[src:src + ln], 0.05))
            prev = p
        elif kind == "dup":
            ln = int(rng.integers(60, 2000))
            parts.append(a[p:p + ln])     # tandem: unit appears twice
            prev = p
        else:  # inversion
            ln = int(rng.integers(200, 4000))
            parts.append(_mutate(rng, _revcomp(a[p:p + ln]), 0.01))
            prev = p + ln
    parts.append(a[prev:])
    hap = np.concatenate(parts)
    hap = _mutate(rng, hap, snp, small_indel)
    return hap.tobytes().decode("latin-1")


def simulate_reads(seqs: List[str], n_reads: int, seed: int = 0,
                   mean_len: int = 15000, min_len: int = 1000,
                   max_len: int = 40000, sub: float = 0.02,
                   indel: float = 0.01) -> List[Tuple[str, str]]:
    """Long reads (15 kb-class N50, PacBio-like errors) off haplotypes."""
    rng = np.random.default_rng(seed)
    out = []
    arrs = [np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
            for s in seqs]
    for i in range(n_reads):
        src = int(rng.integers(0, len(arrs)))
        a = arrs[src]
        ln = int(np.clip(rng.lognormal(np.log(mean_len), 0.45),
                         min_len, min(max_len, len(a))))
        st = int(rng.integers(0, len(a) - ln + 1))
        r = a[st:st + ln]
        if rng.random() < 0.5:
            r = _revcomp(r)
        r = _mutate(rng, r, sub, indel)
        out.append((f"rd{i}_h{src}_{st}", r.tobytes().decode("latin-1")))
    return out


def write_fasta(path: str, recs: List[Tuple[str, str]], width: int = 80):
    with open(path, "w") as fh:
        for name, seq in recs:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")
