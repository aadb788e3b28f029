"""Pair-end batch driver (Do_PairAlign equivalent, main.cpp:116-131).

SAM mode writes paired + unpaired lines into one file; BSP mode writes pairs
to -o and unpaired hits to the -2 file (main.cpp:103-107)."""

from __future__ import annotations

import os
import time

from ..output.pair_sam import PairFormatter
from ..output.sam import sam_header
from ..readio import BATCH_NUM, open_read_stream
from ..utils import RandR, StepTimer
from .pair_host import PairHostEngine


def run_pair_end(o, genome, index) -> int:
    p = o.param
    engine = make_pair_engine(o, genome, index)
    from ..cli import _randr_seed
    fmt = PairFormatter(genome, p, RandR(_randr_seed()))
    sa = open_read_stream(o.query_a, p, readset=1)
    sb = open_read_stream(o.query_b, p, readset=2)
    timer = StepTimer()
    fout = open(o.out_file, "w")
    fout_unpair = None
    if p.out_sam:
        fout.write(sam_header(genome))
    else:
        if not o.out_unpair:
            raise SystemExit(
                "failed to open output file for unpaired hits "
                "(check -2 option)")
        fout_unpair = open(o.out_unpair, "w")

    total = 0
    while True:
        batch_a = sa.next_batch(BATCH_NUM)
        batch_b = sb.next_batch(BATCH_NUM)
        if not batch_a or len(batch_a) != len(batch_b):
            break
        paired_out, unpair_out = engine.format_batch(batch_a, batch_b, fmt)
        fout.write(paired_out)
        if fout_unpair is not None:
            fout_unpair.write(unpair_out)
        else:
            fout.write(unpair_out)
        total += len(batch_a)
        print(f"{total} reads finished. {timer.total():.1f} secs passed")
    fout.close()
    if fout_unpair is not None:
        fout_unpair.close()
    sa.close()
    sb.close()
    denom = max(total, 1)
    print("Total number of aligned reads: \n"
          f"pairs:       {fmt.n_aligned_pairs} "
          f"({100.0 * fmt.n_aligned_pairs / denom:.2g}%)\n"
          f"single a:    {fmt.n_aligned_a} "
          f"({100.0 * fmt.n_aligned_a / denom:.2g}%)\n"
          f"single b:    {fmt.n_aligned_b} "
          f"({100.0 * fmt.n_aligned_b / denom:.2g}%)")
    if p.out_sam == 2:
        from ..output.bam import sam_to_bam
        sam_to_bam(o.out_file)
    return 0


def make_pair_engine(o, genome, index):
    if o.engine != "host":
        try:
            from .pair_device import PairDeviceEngine
            return PairDeviceEngine(genome, index, o.param)
        except ImportError:
            if o.engine == "device":
                raise
    return HostPairBatch(genome, index, o.param)


class HostPairBatch:
    """Batch wrapper over the exact per-pair engine."""

    def __init__(self, genome, index, param):
        self.engine = PairHostEngine(genome, index, param)
        self.param = param

    def format_batch(self, batch_a, batch_b, fmt: PairFormatter):
        p = self.param
        main_parts = []
        unpair_parts = []
        # the reference appends pair + unpaired lines per read, in read
        # order; in SAM mode both go to the same stream (pairs.cpp:213-217)
        for ra, rb in zip(batch_a, batch_b):
            pres = self.engine.align_pair(ra, rb)
            fell = 1
            if pres.paired:
                text, fell = fmt.string_align_pair(ra, rb, pres)
                main_parts.append(text)
            if fell == 1 or not pres.paired:
                up = fmt.string_align_unpair(
                    ra, rb, pres.filtered_a, pres.filtered_b, pres)
                (main_parts if p.out_sam else unpair_parts).append(up)
        return "".join(main_parts), "".join(unpair_parts)
