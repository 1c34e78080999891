"""Deterministic synthetic toydata: 5 metagenome-like FASTA samples.

Stand-in for the reference README's 5-sample example set (README.md:62-73;
the original Helsinki download URLs are dead).  Designed so the mined
entropy spectrum spans the production cutoff 1.2 (example-server.sh):

  * 6 "species" genomes, each present in only a subset of samples, with
    per-sample 1% mutations -> mid/high-entropy shared substrings;
  * high-copy "repeat elements" planted into specific sample pairs at
    ~60x coverage -> low-entropy, high-frequency substrings (these are
    what pass --emax 1.2 with pmin=2);
  * lowercase and 'N' sprinkles to exercise the normalize path.

CAUTION (reference bug, metaserver.cpp:211-226): the reference server's
single-active-reader fast path skips the depth<=6 'R' checksum bytes
("FIXME this should not occur"), so it crashes on data where a depth<=6
trie node is active in exactly one sample under the client's fmin and
pmin>1.  With fmin=2 this generator keeps all depth<=6 nodes shared by
>=2 samples (dense 4^6 coverage); higher fmin needs pmin=1 configs.

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


def de_bruijn(k: int, order: int) -> np.ndarray:
    """de Bruijn sequence B(k, order) over ACGT[:k], wrapped by order-1
    symbols so every k**order substring of length `order` occurs linearly."""
    a = [0] * k * order
    seq: list[int] = []

    def db(t: int, p: int) -> None:
        if t > order:
            if order % p == 0:
                seq.extend(a[1 : p + 1])
        else:
            a[t] = a[t - p]
            db(t + 1, p)
            for j in range(a[t - p] + 1, k):
                a[t] = j
                db(t + 1, t)

    db(1, 1)
    arr = np.array(seq + seq[: order - 1], dtype=np.int64)
    return BASES[arr]


GOLDEN_SEED = 0xD5A2   # the frozen goldens were generated with this


def make_toydata(outdir: str, scale: int = 1,
                 seed: int = GOLDEN_SEED) -> list[str]:
    rng = np.random.default_rng(seed)
    nspecies = 6
    glen = 800 * scale
    species = [_genome(rng, glen) for _ in range(nspecies)]
    # which samples carry each species (2..4 of the 5)
    carriers = [
        sorted(rng.choice(NSAMPLES, size=int(rng.integers(2, 5)), replace=False))
        for _ in range(nspecies)
    ]
    # high-copy repeat elements: (sequence, {sample: copies})
    repeats = []
    for r in range(3):
        elem = _genome(rng, 120)
        pair = sorted(rng.choice(NSAMPLES, size=2, replace=False))
        copies = {int(s): int(rng.integers(40, 80)) for s in pair}
        repeats.append((elem, copies))

    reads_per_sample = 100 * scale
    read_len = 80
    # Control spike-in present in every sample: a de Bruijn(4,6) sequence
    # guarantees every 6-mer occurs (freq >= 2 after the builder's
    # reverse-complement doubling) in every sample, keeping every
    # depth<=6 trie node multi-sample-active -- which sidesteps the
    # reference metaserver's traverseOne checksum bug (see module doc).
    spikein = de_bruijn(4, 6)

    paths = []
    os.makedirs(outdir, exist_ok=True)
    for s in range(NSAMPLES):
        pool = [sp for sp in range(nspecies) if s in carriers[sp]]
        weights = rng.dirichlet(np.ones(len(pool)) * 0.8)
        local = {sp: _mutate(rng, species[sp], 0.01) for sp in pool}
        lines = []
        ridx = 0

        def emit(read: np.ndarray, tag: str) -> None:
            nonlocal ridx
            lines.append(f">read_{s}_{ridx} {tag}".encode())
            seq = read.tobytes()
            lines.extend(seq[i : i + 70] for i in range(0, len(seq), 70))
            ridx += 1

        for r in range(reads_per_sample):
            sp = pool[rng.choice(len(pool), p=weights)]
            start = int(rng.integers(0, glen - read_len))
            read = local[sp][start : start + read_len].copy()
            if r % 17 == 0:
                read[: read_len // 4] += 32  # lowercase
            if r % 23 == 0:
                read[read_len // 2] = ord("N")
            emit(read, f"species={sp}")
        for rid, (elem, copies) in enumerate(repeats):
            for c in range(copies.get(s, 0)):
                # tiny per-copy jitter: start offset, keeps k-mers overlapping
                off = int(rng.integers(0, 8))
                emit(elem[off:], f"repeat={rid}")
        emit(spikein, "control")

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
