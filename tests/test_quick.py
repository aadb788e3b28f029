"""Quick cross-cutting parity subset (``pytest -m quick``): one small
golden comparison per major mode — SE SAM + BSP, PE SAM, RRBS+trim SAM —
all through the device engine's native block paths, each vs the compiled
reference binary.  Sized to re-verify core parity in well under 3 minutes
(the full suite is the exhaustive matrix)."""

import pytest

from .conftest import simulate
from .test_golden_se import assert_same, run_ours, run_ref

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def quick_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("quick")
    simulate(d, genome_out="g.fa", reads_out="se.fq", n_reads=400,
             read_len=60, chr_len=30000, seed=5, error_rate=0.02)
    simulate(d, genome_out="gp.fa", reads_out="p1.fq", reads2_out="p2.fq",
             pe=True, n_reads=300, read_len=60, chr_len=30000, seed=6,
             insert_min=40, insert_max=150, error_rate=0.01)
    return d


def test_quick_se_sam(reference_binary, quick_data):
    base = ["-a", "se.fq", "-d", "g.fa", "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, quick_data, base + ["-o", "r1.sam"])
    run_ours(quick_data, base + ["-o", "o1.sam"], engine="device")
    assert_same(quick_data, "r1.sam", "o1.sam")


def test_quick_se_bsp(reference_binary, quick_data):
    base = ["-a", "se.fq", "-d", "g.fa", "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, quick_data, base + ["-o", "r1.bsp"])
    run_ours(quick_data, base + ["-o", "o1.bsp"], engine="device")
    assert_same(quick_data, "r1.bsp", "o1.bsp")


def test_quick_pe_sam(reference_binary, quick_data):
    base = ["-a", "p1.fq", "-b", "p2.fq", "-d", "gp.fa",
            "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, quick_data, base + ["-o", "r2.sam"])
    run_ours(quick_data, base + ["-o", "o2.sam"], engine="device")
    assert_same(quick_data, "r2.sam", "o2.sam")


def test_quick_se_trim(reference_binary, quick_data):
    base = ["-a", "se.fq", "-d", "g.fa", "-S", "1", "-v", "2", "-u",
            "-A", "AGATCGGAAGAGC", "-q", "10"]
    run_ref(reference_binary, quick_data, base + ["-o", "r3.sam"])
    run_ours(quick_data, base + ["-o", "o3.sam"], engine="device")
    assert_same(quick_data, "r3.sam", "o3.sam")
