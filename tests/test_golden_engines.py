"""Golden parity of the DEVICE and SHARDED engines vs the reference binary.

Round-1 verdict: every golden test ran --engine host only, which let a real
device-engine parity bug on mixed-length reads survive.  This suite runs the
SE matrix through the vectorized engines, including the stale-seed-schedule
corner (reads with (len - interval + 1) % seed_size == 0 interleaved with
other lengths reuse the reference SingleAlign's per-instance buffers,
align.cpp:454-469)."""

import pytest

from .conftest import simulate
from .test_golden_se import assert_same, run_ours, run_ref


@pytest.fixture(scope="module")
def eng_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("eng")
    simulate(d, genome_out="ref.fa", reads_out="reads.fq", n_reads=800,
             read_len=50, chr_len=40000, seed=21, error_rate=0.02)
    simulate(d, genome_out="ref3.fa", reads_out="reads100.fq", n_reads=600,
             read_len=100, chr_len=15000, n_chr=3, seed=22, error_rate=0.02)
    # mixed-length reads: interleave 51nt (the (len-I+1) % S == 0 stale
    # corner for -s 16 -I 4) with 50nt — the round-1 device parity bug repro
    simulate(d, genome_out="refm.fa", reads_out="readsm_raw.fq", n_reads=600,
             read_len=51, chr_len=30000, seed=23, error_rate=0.02)
    raw = (d / "readsm_raw.fq").read_text().splitlines()
    out = []
    for k in range(0, len(raw), 4):
        name, seq, plus, qual = raw[k: k + 4]
        if (k // 4) % 2 == 0:
            seq, qual = seq[:50], qual[:50]
        out += [name, seq, plus, qual]
    (d / "readsm.fq").write_text("\n".join(out) + "\n")
    return d


@pytest.mark.parametrize("engine", ["device", "sharded"])
@pytest.mark.parametrize("cfg", [
    ["-S", "1", "-v", "2", "-u"],
    ["-S", "1", "-v", "3", "-r", "0", "-u"],
])
def test_engines_sam_parity(reference_binary, eng_data, cfg, engine):
    base = ["-a", "reads.fq", "-d", "ref.fa"]
    run_ref(reference_binary, eng_data, base + ["-o", "ref.sam"] + cfg)
    run_ours(eng_data, base + ["-o", f"our_{engine}.sam"] + cfg,
             engine=engine)
    assert_same(eng_data, "ref.sam", f"our_{engine}.sam")


@pytest.mark.parametrize("cfg", [
    ["-S", "1", "-v", "2", "-u", "-R"],
    ["-S", "1", "-v", "2", "-s", "12"],
    ["-S", "1", "-v", "2", "-I", "2"],
    ["-S", "1", "-v", "2", "-n", "1"],
])
def test_device_sam_matrix(reference_binary, eng_data, cfg):
    base = ["-a", "reads100.fq", "-d", "ref3.fa"]
    run_ref(reference_binary, eng_data, base + ["-o", "refm.sam"] + cfg)
    run_ours(eng_data, base + ["-o", "ourm.sam"] + cfg, engine="device")
    assert_same(eng_data, "refm.sam", "ourm.sam")


def test_device_bsp_parity(reference_binary, eng_data):
    base = ["-a", "reads100.fq", "-d", "ref3.fa", "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, eng_data, base + ["-o", "ref.bsp"])
    run_ours(eng_data, base + ["-o", "our.bsp"], engine="device")
    assert_same(eng_data, "ref.bsp", "our.bsp")


@pytest.fixture(scope="module")
def pe_eng_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("pe_eng")
    simulate(d, genome_out="ec.fa", reads_out="pe1.fq", reads2_out="pe2.fq",
             pe=True, n_reads=500, read_len=76, chr_len=50000, seed=41,
             error_rate=0.01)
    # short inserts force overlap trimming at emit (pairs.cpp:296-306)
    simulate(d, genome_out="ec2.fa", reads_out="po1.fq", reads2_out="po2.fq",
             pe=True, n_reads=400, read_len=76, chr_len=40000, seed=42,
             insert_min=40, insert_max=120, error_rate=0.01)
    return d


@pytest.mark.parametrize("cfg", [
    ["-S", "1", "-v", "2", "-u"],
    ["-S", "1", "-v", "2", "-n", "1", "-u"],
    ["-S", "1", "-v", "2", "-r", "0", "-u"],
])
def test_pe_device_sam_parity(reference_binary, pe_eng_data, cfg):
    base = ["-a", "pe1.fq", "-b", "pe2.fq", "-d", "ec.fa"]
    run_ref(reference_binary, pe_eng_data, base + ["-o", "refp.sam"] + cfg)
    run_ours(pe_eng_data, base + ["-o", "ourp.sam"] + cfg, engine="device")
    assert_same(pe_eng_data, "refp.sam", "ourp.sam")


def test_pe_device_overlap_and_bsp(reference_binary, pe_eng_data):
    base = ["-a", "po1.fq", "-b", "po2.fq", "-d", "ec2.fa",
            "-S", "3", "-v", "2", "-u"]
    run_ref(reference_binary, pe_eng_data, base + ["-o", "refo.sam"])
    run_ours(pe_eng_data, base + ["-o", "ouro.sam"], engine="device")
    assert_same(pe_eng_data, "refo.sam", "ouro.sam")
    run_ref(reference_binary, pe_eng_data,
            base + ["-o", "refo.bsp", "-2", "refo.unp"])
    run_ours(pe_eng_data, base + ["-o", "ouro.bsp", "-2", "ouro.unp"],
             engine="device")
    assert_same(pe_eng_data, "refo.bsp", "ouro.bsp")
    assert_same(pe_eng_data, "refo.unp", "ouro.unp")


@pytest.mark.parametrize("engine", ["device", "sharded"])
def test_mixed_length_stale_state(reference_binary, eng_data, engine):
    """The round-1 bug: interleaved 50/51nt reads diverge on the device
    engine because the 51nt reads' seed schedule reads per-instance state
    left by earlier reads (MateState).  Must be byte-identical now."""
    base = ["-a", "readsm.fq", "-d", "refm.fa", "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, eng_data, base + ["-o", "refmix.sam"])
    run_ours(eng_data, base + ["-o", f"ourmix_{engine}.sam"], engine=engine)
    assert_same(eng_data, "refmix.sam", f"ourmix_{engine}.sam")


@pytest.mark.parametrize("extra", [[], ["-r", "0"]])
def test_s0_pe_device_matches_host(pe_eng_data, extra):
    """PE under -S 0 (the reference default): the sequential rand_r draws
    fire only for multi-hit pairs (pairs.cpp:235) and unpaired multi-hit
    mates (pairs.cpp:258,271) — those pairs replay on the host engine, the
    rest stay on device and consume no draws.  With a pinned rand_r seed
    device and host engines must be byte-identical."""
    import subprocess
    import sys

    from .conftest import REPO

    d = pe_eng_data
    env = {"PYTHONPATH": str(REPO), "BSMAP_TPU_CPU_JIT_CACHE": "1", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "BSMAP_TPU_DEV_BATCH": "2048",
           "BSMAP_TPU_CANDS_PER_READ": "16", "HOME": "/root",
           "BSMAP_TPU_RANDR_SEED": "1234"}
    tag = "r0" if extra else "r1"
    base = ["-a", "po1.fq", "-b", "po2.fq", "-d", "ec2.fa",
            "-v", "2", "-u", "-S", "0"] + extra
    for eng, out in (("host", f"s0p_host_{tag}.sam"),
                     ("device", f"s0p_dev_{tag}.sam")):
        r = subprocess.run(
            [sys.executable, "-m", "bsmap_tpu.cli"] + base
            + ["-o", out, "--engine", eng],
            cwd=d, capture_output=True, env=env)
        assert r.returncode == 0, r.stderr.decode()
    assert_same(d, f"s0p_host_{tag}.sam", f"s0p_dev_{tag}.sam")


def test_s0_device_matches_host(eng_data):
    """-S 0 (the reference default): sequential rand_r selection.  With a
    pinned rand_r seed the device fast path (kernel rand=0, unique reads
    draw-skipped, multi-hit reads replayed) must be byte-identical to the
    host engine's natural per-read draws."""
    import os
    import subprocess
    import sys

    from .conftest import REPO

    d = eng_data
    env = {"PYTHONPATH": str(REPO), "BSMAP_TPU_CPU_JIT_CACHE": "1", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "BSMAP_TPU_DEV_BATCH": "2048",
           "BSMAP_TPU_CANDS_PER_READ": "16", "HOME": "/root",
           "BSMAP_TPU_RANDR_SEED": "99"}
    base = ["-a", "reads.fq", "-d", "ref.fa", "-v", "2", "-u", "-S", "0"]
    for eng, out in (("host", "s0_host.sam"), ("device", "s0_dev.sam")):
        r = subprocess.run(
            [sys.executable, "-m", "bsmap_tpu.cli"] + base
            + ["-o", out, "--engine", eng],
            cwd=d, capture_output=True, env=env)
        assert r.returncode == 0, r.stderr.decode()
    assert_same(d, "s0_host.sam", "s0_dev.sam")
