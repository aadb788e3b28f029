"""Golden tests for RRBS digestion-site-constrained mapping (C7/C8):
fixed seed 12 / interval 1, fragment-size filters, ZP/ZL tags, PE rescue,
digestion-site-tolerant adapter trimming."""

import random
import re

import pytest

from .test_golden_se import assert_same, run_ours, run_ref

ADAPT = "AGATCGGAAGAGC"
COMP = str.maketrans("ACGT", "TGCA")


@pytest.fixture(scope="module")
def rrbs_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("rrbs")
    rng = random.Random(77)
    parts = []
    pos = 0
    while pos < 60000:
        seg = "".join(rng.choice("ACGT")
                      for _ in range(rng.randint(30, 300)))
        parts.append(seg)
        parts.append("CCGG")
        pos += len(seg) + 4
    g = "".join(parts)
    with open(d / "rrbs.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + "\n")
    sites = [m.start() for m in re.finditer("CCGG", g)]

    def conv(s):
        return "".join("T" if c == "C" and rng.random() < 0.9 else c
                       for c in s)

    with open(d / "se.fq", "w") as f:
        n = 0
        for _ in range(4000):
            i = rng.randrange(len(sites) - 1)
            start = sites[i] + 1
            frag = g[start: sites[i + 1] + 3]
            if not (28 <= len(frag) <= 500):
                continue
            L = min(60, len(frag))
            s = (frag[:L] if rng.random() < 0.5
                 else frag[::-1].translate(COMP)[:L])
            s = conv(s)
            q = "".join(chr(33 + rng.randint(20, 40)) for _ in s)
            f.write(f"@r{n}_{start}\n{s}\n+\n{q}\n")
            n += 1
            if n >= 1200:
                break
    f1 = open(d / "pe1.fq", "w")
    f2 = open(d / "pe2.fq", "w")
    n = 0
    for _ in range(6000):
        i = rng.randrange(len(sites) - 1)
        start = sites[i] + 1
        frag = g[start: sites[i + 1] + 3]
        if not (28 <= len(frag) <= 500):
            continue
        c = conv(frag)
        r1 = (c + ADAPT)[:60]
        r2 = (c[::-1].translate(COMP) + ADAPT)[:60]
        q1 = "".join(chr(33 + rng.randint(20, 40)) for _ in r1)
        q2 = "".join(chr(33 + rng.randint(20, 40)) for _ in r2)
        f1.write(f"@p{n}_{start}/1\n{r1}\n+\n{q1}\n")
        f2.write(f"@p{n}_{start}/2\n{r2}\n+\n{q2}\n")
        n += 1
        if n >= 1000:
            break
    f1.close()
    f2.close()
    return d


@pytest.mark.parametrize("engine", ["host", "device"])
def test_rrbs_se_parity(reference_binary, rrbs_data, engine):
    base = ["-a", "se.fq", "-d", "rrbs.fa", "-D", "C-CGG",
            "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, rrbs_data, base + ["-o", "ref.sam"])
    run_ours(rrbs_data, base + ["-o", "our.sam"], engine=engine)
    assert_same(rrbs_data, "ref.sam", "our.sam")


def test_rrbs_se_device_trim_and_bsp(reference_binary, rrbs_data):
    """Device RRBS with adapter trimming (per-read filter path) and BSP
    output (full rows incl. histograms + ZP/ZL emitted host-side)."""
    base = ["-a", "se.fq", "-d", "rrbs.fa", "-D", "C-CGG",
            "-S", "1", "-v", "2", "-u", "-A", ADAPT]
    run_ref(reference_binary, rrbs_data, base + ["-o", "reft.sam"])
    run_ours(rrbs_data, base + ["-o", "ourt.sam"], engine="device")
    assert_same(rrbs_data, "reft.sam", "ourt.sam")
    base = ["-a", "se.fq", "-d", "rrbs.fa", "-D", "C-CGG",
            "-S", "1", "-v", "2", "-u"]
    run_ref(reference_binary, rrbs_data, base + ["-o", "ref.bsp"])
    run_ours(rrbs_data, base + ["-o", "our.bsp"], engine="device")
    assert_same(rrbs_data, "ref.bsp", "our.bsp")


def test_rrbs_pe_adapter_parity(reference_binary, rrbs_data):
    base = ["-a", "pe1.fq", "-b", "pe2.fq", "-d", "rrbs.fa", "-D", "C-CGG",
            "-S", "1", "-v", "2", "-u", "-A", ADAPT]
    run_ref(reference_binary, rrbs_data, base + ["-o", "refp.sam"])
    run_ours(rrbs_data, base + ["-o", "ourp.sam"])
    assert_same(rrbs_data, "refp.sam", "ourp.sam")
