"""Fast vectorized bench-data generator (numpy; ~1M reads/s).

Unlike tools/simulate.py (the golden-test simulator, which models methylation
levels, errors and adapters read-by-read), this produces fully-converted
bisulfite reads in bulk for throughput benchmarking: every read is a genome
window with C->T on the sampled strand.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.zeros(256, dtype=np.uint8)
for a, b in zip(b"ACGT", b"TGCA"):
    COMP[a] = b


def make_genome(seed: int, n_chr: int, chr_len: int):
    rng = np.random.RandomState(seed)
    return [BASES[rng.randint(0, 4, size=chr_len)] for _ in range(n_chr)]


def write_genome(path: str, chrs) -> None:
    with open(path, "wb") as f:
        for i, c in enumerate(chrs):
            f.write(b">chr%d\n" % (i + 1))
            for j in range(0, len(c), 70):
                f.write(c[j: j + 70].tobytes() + b"\n")


def make_reads(seed: int, chrs, n_reads: int, read_len: int) -> np.ndarray:
    """(n_reads, read_len) uint8 array of fully-converted reads."""
    rng = np.random.RandomState(seed + 1)
    ci = rng.randint(0, len(chrs), size=n_reads)
    out = np.empty((n_reads, read_len), dtype=np.uint8)
    offs = np.arange(read_len)
    for c, chrseq in enumerate(chrs):
        sel = np.where(ci == c)[0]
        pos = rng.randint(0, len(chrseq) - read_len, size=len(sel))
        win = chrseq[pos[:, None] + offs[None, :]]
        out[sel] = win
    # half the reads from the Crick strand (reverse complement)
    flip = rng.random_sample(n_reads) < 0.5
    out[flip] = COMP[out[flip]][:, ::-1]
    # bisulfite: full conversion C->T
    out[out == ord("C")] = ord("T")
    return out


def write_fastq(path: str, reads: np.ndarray) -> None:
    n, L = reads.shape
    qual = b"I" * L
    with open(path, "wb") as f:
        buf = []
        for i in range(n):
            buf.append(b"@r%d\n%s\n+\n%s\n" % (i, reads[i].tobytes(), qual))
            if len(buf) >= 10000:
                f.write(b"".join(buf))
                buf.clear()
        f.write(b"".join(buf))


def generate(out_dir: str, seed: int = 7, n_chr: int = 2,
             chr_len: int = 5_000_000, n_reads: int = 200_000,
             read_len: int = 100):
    import os
    os.makedirs(out_dir, exist_ok=True)
    gpath = os.path.join(out_dir, "genome.fa")
    rpath = os.path.join(out_dir, "reads.fq")
    stamp = os.path.join(
        out_dir, f"gen_{seed}_{n_chr}_{chr_len}_{n_reads}_{read_len}.ok")
    if os.path.exists(stamp):
        return gpath, rpath
    chrs = make_genome(seed, n_chr, chr_len)
    write_genome(gpath, chrs)
    write_fastq(rpath, make_reads(seed, chrs, n_reads, read_len))
    open(stamp, "w").close()
    return gpath, rpath


if __name__ == "__main__":
    import sys
    generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bsmap_tpu_bench")
