"""Deterministic synthetic toydata: 5 metagenome-like FASTA samples.

Stand-in for the reference README's 5-sample example set (README.md:62-73;
the original Helsinki download URLs are dead).  Samples share a pool of
"species" genomes with per-sample mutations and abundance differences so
that cross-sample discriminative substrings exist at every entropy level.
Seeded, so goldens frozen from the reference binaries stay reproducible.

Usage: python tests/make_toydata.py [outdir] [--scale N]
"""

from __future__ import annotations

import os
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
NSAMPLES = 5


def _genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return BASES[rng.integers(0, 4, size=length)]


def _mutate(rng: np.random.Generator, g: np.ndarray, rate: float) -> np.ndarray:
    g = g.copy()
    k = rng.binomial(len(g), rate)
    pos = rng.choice(len(g), size=k, replace=False)
    g[pos] = BASES[rng.integers(0, 4, size=k)]
    return g


def make_toydata(outdir: str, scale: int = 1) -> list[str]:
    rng = np.random.default_rng(0xD5A)
    nspecies = 6
    glen = 4000 * scale
    species = [_genome(rng, glen) for _ in range(nspecies)]
    reads_per_sample = 60 * scale
    read_len = 400

    paths = []
    os.makedirs(outdir, exist_ok=True)
    for s in range(NSAMPLES):
        # sample-specific species abundances; species s missing from sample s
        weights = rng.dirichlet(np.ones(nspecies) * 2.0)
        weights[s % nspecies] = 0.0
        weights /= weights.sum()
        local = [_mutate(rng, g, 0.01) for g in species]
        lines = []
        for r in range(reads_per_sample):
            sp = rng.choice(nspecies, p=weights)
            start = int(rng.integers(0, glen - read_len))
            read = local[sp][start : start + read_len].copy()
            # sprinkle lowercase and N to exercise normalization
            if r % 17 == 0:
                read[: read_len // 4] += 32  # lowercase
            if r % 23 == 0:
                read[read_len // 2] = ord("N")
            lines.append(f">read_{s}_{r} species={sp}".encode())
            seq = read.tobytes()
            # wrap at 70 cols like typical FASTA
            lines.extend(seq[i : i + 70] for i in range(0, len(seq), 70))
        path = os.path.join(outdir, f"toy{s}.fasta")
        with open(path, "wb") as f:
            f.write(b"\n".join(lines) + b"\n")
        paths.append(path)
    return paths


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "tests/data/toydata"
    scale = 1
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
    for p in make_toydata(outdir, scale):
        print(p)
