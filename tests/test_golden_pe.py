"""Golden-output tests for pair-end alignment (pairs.cpp semantics),
including overlap trimming, unpaired fallback, and the stale-seed-offset
corner for reads with (len-I+1) % seed == 0."""

import pytest

from .conftest import simulate
from .test_golden_se import assert_same, run_ours, run_ref


@pytest.fixture(scope="module")
def pe_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("pe")
    simulate(d, genome_out="ec.fa", reads_out="pe1.fq", reads2_out="pe2.fq",
             pe=True, n_reads=800, read_len=76, chr_len=60000, seed=21,
             error_rate=0.01)
    # short inserts: overlap trimming + 51nt reads (stale-offset corner)
    simulate(d, genome_out="ec2.fa", reads_out="po1.fq", reads2_out="po2.fq",
             pe=True, n_reads=600, read_len=76, chr_len=40000, seed=31,
             insert_min=40, insert_max=120, error_rate=0.01)
    return d


@pytest.mark.parametrize("cfg", [
    ["-S", "1", "-v", "2", "-u"],
    ["-S", "1", "-v", "2", "-n", "1", "-u"],
    ["-S", "5", "-v", "3"],
])
def test_pe_sam_parity(reference_binary, pe_data, cfg):
    base = ["-a", "pe1.fq", "-b", "pe2.fq", "-d", "ec.fa"]
    run_ref(reference_binary, pe_data, base + ["-o", "ref.sam"] + cfg)
    run_ours(pe_data, base + ["-o", "our.sam"] + cfg)
    assert_same(pe_data, "ref.sam", "our.sam")


def test_pe_overlap_trim_parity(reference_binary, pe_data):
    base = ["-a", "po1.fq", "-b", "po2.fq", "-d", "ec2.fa",
            "-S", "3", "-v", "2", "-u"]
    run_ref(reference_binary, pe_data, base + ["-o", "refo.sam"])
    run_ours(pe_data, base + ["-o", "ouro.sam"])
    assert_same(pe_data, "refo.sam", "ouro.sam")


def test_pe_bsp_with_unpaired_file(reference_binary, pe_data):
    base = ["-a", "pe1.fq", "-b", "pe2.fq", "-d", "ec.fa",
            "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, pe_data,
            base + ["-o", "ref.bsp", "-2", "refu.bsp"])
    run_ours(pe_data, base + ["-o", "our.bsp", "-2", "ouru.bsp"])
    assert_same(pe_data, "ref.bsp", "our.bsp")
    assert_same(pe_data, "refu.bsp", "ouru.bsp")


@pytest.mark.parametrize("cfg", [
    ["-S", "1", "-v", "2", "-u"],
    ["-S", "1", "-v", "2", "-n", "1", "-u"],
])
def test_pe_device_engine_parity(reference_binary, pe_data, cfg):
    """The vectorized PE engine (two fused SE dispatches + K x K join) must
    match the reference byte-for-byte."""
    base = ["-a", "pe1.fq", "-b", "pe2.fq", "-d", "ec.fa"]
    run_ref(reference_binary, pe_data, base + ["-o", "refd.sam"] + cfg)
    run_ours(pe_data, base + ["-o", "ourd.sam"] + cfg, engine="device")
    assert_same(pe_data, "refd.sam", "ourd.sam")


@pytest.fixture(scope="module")
def pe_trim_data(tmp_path_factory):
    """Adapter run-through + quality-variant PE data: the common RRBS-free
    trimming protocol the round-2 device PE engine refused (it fell back to
    per-read Python)."""
    d = tmp_path_factory.mktemp("petrim")
    simulate(d, genome_out="gt.fa", reads_out="pt1.fq", reads2_out="pt2.fq",
             pe=True, n_reads=500, read_len=60, chr_len=30000, seed=51,
             insert_min=40, insert_max=120, error_rate=0.01,
             adapter="AGATCGGAAGAGC")
    return d


@pytest.mark.parametrize("engine", ["host", "device"])
def test_pe_adapter_trim_parity(reference_binary, pe_trim_data, engine):
    base = ["-a", "pt1.fq", "-b", "pt2.fq", "-d", "gt.fa",
            "-S", "1", "-v", "2", "-u", "-A", "AGATCGGAAGAGC"]
    run_ref(reference_binary, pe_trim_data, base + ["-o", "reft.sam"])
    run_ours(pe_trim_data, base + ["-o", f"ourt_{engine}.sam"],
             engine=engine)
    assert_same(pe_trim_data, "reft.sam", f"ourt_{engine}.sam")


@pytest.mark.parametrize("engine", ["host", "device"])
def test_pe_qual_trim_parity(reference_binary, pe_trim_data, engine):
    base = ["-a", "pt1.fq", "-b", "pt2.fq", "-d", "gt.fa",
            "-S", "1", "-v", "2", "-u", "-q", "30"]
    run_ref(reference_binary, pe_trim_data, base + ["-o", "refq.sam"])
    run_ours(pe_trim_data, base + ["-o", f"ourq_{engine}.sam"],
             engine=engine)
    assert_same(pe_trim_data, "refq.sam", f"ourq_{engine}.sam")
