#!/usr/bin/env python3
"""Bisulfite read simulator (wgsim-style; the reference's implied test
methodology, SURVEY.md section 4): generates a random genome and simulated
WGBS/RRBS reads with known origin, bisulfite conversion and optional errors.

Reads are named ``r<id>_<chr>_<pos1>_<strand>`` so mapping accuracy can be
scored, and deterministic given --seed.
"""

from __future__ import annotations

import argparse
import random

COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def make_genome(rng: random.Random, n_chr: int, length: int,
                gc: float = 0.5) -> list[tuple[str, str]]:
    out = []
    for c in range(n_chr):
        w = [rng.choices("ACGT", weights=[(1 - gc) / 2, gc / 2, gc / 2,
                                          (1 - gc) / 2])[0]
             for _ in range(length)]
        out.append((f"chr{c + 1}", "".join(w)))
    return out


def bis_convert(seq: str, rng: random.Random, meth_cpg: float,
                meth_other: float, genome_context: str) -> str:
    """C->T conversion of unmethylated cytosines on the read's strand."""
    out = []
    n = len(seq)
    for i, b in enumerate(seq):
        if b == "C":
            is_cpg = i + 1 < len(genome_context) and genome_context[i + 1] == "G"
            p_meth = meth_cpg if is_cpg else meth_other
            out.append("C" if rng.random() < p_meth else "T")
        else:
            out.append(b)
    return "".join(out)


def add_errors(seq: str, rng: random.Random, erate: float) -> str:
    if erate <= 0:
        return seq
    out = list(seq)
    for i, b in enumerate(out):
        if rng.random() < erate:
            out[i] = rng.choice([x for x in "ACGT" if x != b])
    return "".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-chr", type=int, default=1)
    ap.add_argument("--chr-len", type=int, default=48502)  # lambda-ish
    ap.add_argument("--n-reads", type=int, default=1000)
    ap.add_argument("--read-len", type=int, default=50)
    ap.add_argument("--error-rate", type=float, default=0.01)
    ap.add_argument("--meth-cpg", type=float, default=0.7)
    ap.add_argument("--meth-other", type=float, default=0.02)
    ap.add_argument("--pe", action="store_true")
    ap.add_argument("--insert-min", type=int, default=100)
    ap.add_argument("--insert-max", type=int, default=400)
    ap.add_argument("--genome-out", required=True)
    ap.add_argument("--reads-out", required=True)
    ap.add_argument("--reads2-out", default="")
    ap.add_argument("--fasta-reads", action="store_true")
    ap.add_argument("--adapter", default="",
                    help="3' adapter appended when fragment < read length")
    args = ap.parse_args()

    rng = random.Random(args.seed)
    genome = make_genome(rng, args.n_chr, args.chr_len)
    with open(args.genome_out, "w") as f:
        for name, seq in genome:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")

    f1 = open(args.reads_out, "w")
    f2 = open(args.reads2_out, "w") if args.pe else None
    L = args.read_len

    def emit(fh, rid, name_suffix, seq):
        seq = add_errors(seq, rng, args.error_rate)
        if args.fasta_reads:
            fh.write(f">r{rid}{name_suffix}\n{seq}\n")
        else:
            qual = "".join(chr(33 + min(40, max(2, int(rng.gauss(35, 4)))))
                           for _ in seq)
            fh.write(f"@r{rid}{name_suffix}\n{seq}\n+\n{qual}\n")

    for rid in range(args.n_reads):
        ci = rng.randrange(len(genome))
        cname, cseq = genome[ci]
        if args.pe:
            ins = rng.randint(args.insert_min, args.insert_max)
            pos = rng.randrange(0, len(cseq) - ins)
            frag = cseq[pos:pos + ins]
            strand = rng.choice("+-")
            if strand == "-":
                frag = revcomp(frag)
            conv = bis_convert(frag, rng, args.meth_cpg, args.meth_other,
                               frag + "A")
            r1 = conv[:L]
            r2 = revcomp(conv)[:L]
            if len(r1) < L and args.adapter:
                r1 = (r1 + args.adapter)[:L]
                r2 = (r2 + args.adapter)[:L]
            emit(f1, rid, f"_{cname}_{pos + 1}_{strand}/1", r1)
            emit(f2, rid, f"_{cname}_{pos + 1}_{strand}/2", r2)
        else:
            pos = rng.randrange(0, len(cseq) - L)
            strand = rng.choice("+-")
            frag = cseq[pos:pos + L]
            if strand == "+":
                conv = bis_convert(frag, rng, args.meth_cpg, args.meth_other,
                                   cseq[pos:pos + L + 1])
            else:
                rc = revcomp(frag)
                conv = bis_convert(rc, rng, args.meth_cpg, args.meth_other,
                                   rc + cseq[max(0, pos - 1):pos][::-1]
                                   .translate(COMP))
            emit(f1, rid, f"_{cname}_{pos + 1}_{strand}", conv)
    f1.close()
    if f2:
        f2.close()


if __name__ == "__main__":
    main()
