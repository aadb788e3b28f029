"""Minimal BAM/BGZF I/O (replaces the vendored samtools 0.1.7, C21/C22).

The reference links libbam for SAM/BAM read *input* (reads.cpp:13-146) and
shells out to ``samtools view|sort|index`` for ``.bam`` output
(sam2bam.sh).  Here both directions are implemented natively:

  * BGZF block compression/decompression (gzip members with the BC extra
    subfield + the 28-byte EOF marker);
  * BAM record encode/decode (SAM spec section 4.2);
  * ``sam_to_bam``: coordinate-sort + write BAM + BAI index (the
    sam2bam.sh pipeline);
  * ``bam_sam_lines``: stream BAM records back as SAM text;
  * ``BamReadStream``: read FASTQ-equivalent reads out of SAM/BAM inputs
    with the reference's mate-interleaving rules (reads.cpp:119-143).
"""

from __future__ import annotations

import os
import struct
import zlib

BAM_MAGIC = b"BAM\x01"
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")
SEQ_NT16 = "=ACMGRSVTWYHKDBN"
SEQ_NT16_CODE = {c: i for i, c in enumerate(SEQ_NT16)}
CIGAR_OPS = "MIDNSHP=X"


# ---------------------------------------------------------------------------
# BGZF
# ---------------------------------------------------------------------------

def bgzf_write_block(out, data: bytes) -> None:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = comp.compress(data) + comp.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF
    # BSIZE stores (total block size - 1); total = 18 header + cdata + 8
    bsize = len(cdata) + 25
    out.write(b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff")
    out.write(struct.pack("<HBBHH", 6, 66, 67, 2, bsize))
    out.write(cdata)
    out.write(struct.pack("<II", crc, len(data) & 0xFFFFFFFF))


class BgzfWriter:
    def __init__(self, path: str):
        self._fh = open(path, "wb")
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 60000:
            bgzf_write_block(self._fh, bytes(self._buf[:60000]))
            del self._buf[:60000]

    def close(self) -> None:
        if self._buf:
            bgzf_write_block(self._fh, bytes(self._buf))
        self._fh.write(BGZF_EOF)
        self._fh.close()


def bgzf_read_all(path: str) -> bytes:
    """Decompress a whole BGZF (or plain gzip) file."""
    out = []
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    d = zlib.decompressobj(31)
    while pos < len(data):
        chunk = d.decompress(data[pos:])
        out.append(chunk)
        pos = len(data) - len(d.unused_data)
        if not d.unused_data:
            break
        d = zlib.decompressobj(31)
    return b"".join(out)


# ---------------------------------------------------------------------------
# BAM record encoding
# ---------------------------------------------------------------------------

def reg2bin(beg: int, end: int) -> int:
    """SAM spec section 5.3 binning scheme."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def encode_aux(tag: str, typ: str, val) -> bytes:
    out = tag.encode()
    if typ == "i":
        return out + b"i" + struct.pack("<i", int(val))
    if typ == "Z":
        return out + b"Z" + str(val).encode() + b"\x00"
    if typ == "A":
        return out + b"A" + str(val).encode()[:1]
    raise ValueError(typ)


def encode_record(refid: int, pos: int, name: str, flag: int, mapq: int,
                  cigar: list[tuple[int, int]], mrefid: int, mpos: int,
                  tlen: int, seq: str, qual: str, aux: bytes) -> bytes:
    l_seq = len(seq)
    if cigar:
        end = pos + sum(ln for ln, op in cigar
                        if CIGAR_OPS[op] in "MDN=X")
    else:
        end = pos + 1
    b = reg2bin(pos, max(end, pos + 1)) if pos >= 0 else 4680
    nameb = name.encode() + b"\x00"
    body = struct.pack("<iiBBHHHiiii", refid, pos, len(nameb), mapq, b,
                       len(cigar), flag, l_seq, mrefid, mpos, tlen)
    body += nameb
    for ln, op in cigar:
        body += struct.pack("<I", (ln << 4) | op)
    sb = bytearray((l_seq + 1) // 2)
    for i, ch in enumerate(seq):
        code = SEQ_NT16_CODE.get(ch.upper(), 15)
        if i % 2 == 0:
            sb[i // 2] = code << 4
        else:
            sb[i // 2] |= code
    body += bytes(sb)
    if qual == "*" or not qual:
        body += b"\xff" * l_seq
    else:
        body += bytes((ord(q) - 33) & 0xFF for q in qual)
    body += aux
    return struct.pack("<i", len(body)) + body


def _parse_cigar(cig: str) -> list[tuple[int, int]]:
    if cig == "*":
        return []
    out = []
    n = 0
    for ch in cig:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            out.append((n, CIGAR_OPS.index(ch)))
            n = 0
    return out


def _sam_line_to_record(cols: list[str], ref_ids: dict[str, int]) -> bytes:
    name, flag, rname, pos, mapq, cig, mrname, mpos, tlen = cols[:9]
    seq, qual = cols[9], cols[10]
    refid = ref_ids.get(rname, -1)
    if mrname == "=":
        mrefid = refid
    else:
        mrefid = ref_ids.get(mrname, -1)
    aux = b""
    for field in cols[11:]:
        tag, typ, val = field.split(":", 2)
        aux += encode_aux(tag, typ, val)
    return encode_record(refid, int(pos) - 1, name, int(flag), int(mapq),
                         _parse_cigar(cig), mrefid, int(mpos) - 1,
                         int(tlen), seq if seq != "*" else "",
                         qual if qual != "*" else "*", aux)


def sam_to_bam(sam_path: str, bam_path: str | None = None,
               make_index: bool = True) -> str:
    """The sam2bam.sh pipeline: SAM text -> coordinate-sorted BAM (+ .bai).
    The input file keeps its name (the reference names the SAM output
    <stem>.bam already: main.cpp:466-473), so we convert in place."""
    if bam_path is None:
        bam_path = sam_path
    with open(sam_path) as fh:
        header_lines = []
        records = []
        ref_names = []
        ref_lens = []
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("@"):
                header_lines.append(line)
                if line.startswith("@SQ"):
                    d = dict(f.split(":", 1) for f in line.split("\t")[1:])
                    ref_names.append(d["SN"])
                    ref_lens.append(int(d["LN"]))
            elif line:
                records.append(line.split("\t"))
    ref_ids = {n: i for i, n in enumerate(ref_names)}
    # samtools sort: by (refid, pos); unmapped (refid -1) last
    def key(cols):
        rid = ref_ids.get(cols[2], -1)
        return (rid if rid >= 0 else 1 << 30, int(cols[3]) - 1)
    records.sort(key=key)

    tmp = bam_path + ".tmp"
    w = BgzfWriter(tmp)
    text = ("\n".join(header_lines) + "\n").encode()
    head = BAM_MAGIC + struct.pack("<i", len(text)) + text
    head += struct.pack("<i", len(ref_names))
    for n, ln in zip(ref_names, ref_lens):
        nb = n.encode() + b"\x00"
        head += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    w.write(head)
    for cols in records:
        w.write(_sam_line_to_record(cols, ref_ids))
    w.close()
    os.replace(tmp, bam_path)
    if make_index:
        try:
            build_bai(bam_path)
        except Exception:
            pass
    return bam_path


# ---------------------------------------------------------------------------
# BAM reading
# ---------------------------------------------------------------------------

class BamFile:
    def __init__(self, path: str):
        data = bgzf_read_all(path)
        if data[:4] != BAM_MAGIC:
            raise ValueError("not a BAM file")
        l_text = struct.unpack_from("<i", data, 4)[0]
        off = 8 + l_text
        self.header_text = data[8: 8 + l_text].decode("latin1")
        n_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        self.ref_names = []
        self.ref_lens = []
        for _ in range(n_ref):
            ln = struct.unpack_from("<i", data, off)[0]
            off += 4
            self.ref_names.append(data[off: off + ln - 1].decode())
            off += ln
            self.ref_lens.append(struct.unpack_from("<i", data, off)[0])
            off += 4
        self._data = data
        self._off = off

    def records(self):
        data, off = self._data, self._off
        n = len(data)
        while off + 4 <= n:
            bs = struct.unpack_from("<i", data, off)[0]
            off += 4
            yield data[off: off + bs]
            off += bs


def decode_record(body: bytes):
    (refid, pos, l_name, mapq, _bin, n_cig, flag, l_seq, mrefid, mpos,
     tlen) = struct.unpack_from("<iiBBHHHiiii", body, 0)
    off = 32
    name = body[off: off + l_name - 1].decode()
    off += l_name
    cigar = []
    for _ in range(n_cig):
        v = struct.unpack_from("<I", body, off)[0]
        cigar.append((v >> 4, v & 0xF))
        off += 4
    seq = []
    for i in range(l_seq):
        byte = body[off + i // 2]
        code = (byte >> 4) if i % 2 == 0 else (byte & 0xF)
        seq.append(SEQ_NT16[code])
    off += (l_seq + 1) // 2
    qual = body[off: off + l_seq]
    off += l_seq
    aux = body[off:]
    return (refid, pos, name, flag, mapq, cigar, mrefid, mpos, tlen,
            "".join(seq), qual, aux)


def decode_aux(aux: bytes) -> list[str]:
    out = []
    off = 0
    while off + 3 <= len(aux):
        tag = aux[off: off + 2].decode()
        typ = chr(aux[off + 2])
        off += 3
        if typ in "cC":
            val = struct.unpack_from("<b" if typ == "c" else "<B",
                                     aux, off)[0]
            off += 1
            out.append(f"{tag}:i:{val}")
        elif typ in "sS":
            val = struct.unpack_from("<h" if typ == "s" else "<H",
                                     aux, off)[0]
            off += 2
            out.append(f"{tag}:i:{val}")
        elif typ in "iI":
            val = struct.unpack_from("<i" if typ == "i" else "<I",
                                     aux, off)[0]
            off += 4
            out.append(f"{tag}:i:{val}")
        elif typ == "f":
            val = struct.unpack_from("<f", aux, off)[0]
            off += 4
            out.append(f"{tag}:f:{val}")
        elif typ == "A":
            out.append(f"{tag}:A:{chr(aux[off])}")
            off += 1
        elif typ == "Z":
            end = aux.index(0, off)
            out.append(f"{tag}:Z:{aux[off:end].decode()}")
            off = end + 1
        else:
            break
    return out


def bam_sam_lines(path: str):
    """Yield SAM text lines (no header) from a BAM file."""
    bf = BamFile(path)
    for body in bf.records():
        (refid, pos, name, flag, mapq, cigar, mrefid, mpos, tlen, seq,
         qual, aux) = decode_record(body)
        rname = bf.ref_names[refid] if refid >= 0 else "*"
        if mrefid < 0:
            mrname = "*"
        else:
            mrname = "=" if mrefid == refid else bf.ref_names[mrefid]
        cig = ("".join(f"{ln}{CIGAR_OPS[op]}" for ln, op in cigar)
               if cigar else "*")
        q = ("*" if (not qual or qual[0] == 0xFF)
             else "".join(chr(c + 33) for c in qual))
        fields = [name, str(flag), rname, str(pos + 1), str(mapq), cig,
                  mrname, str(mpos + 1), str(tlen), seq if seq else "*", q]
        fields.extend(decode_aux(aux))
        yield "\t".join(fields) + "\n"


def build_bai(bam_path: str) -> str:
    """Write a BAI index (SAM spec section 5.2) for a coordinate-sorted BAM.
    Virtual offsets require re-walking the BGZF blocks; since this writer
    emits fixed 60000-byte logical blocks, offsets are reconstructed from
    the compressed stream."""
    # map logical offset -> virtual offset by scanning BGZF headers
    blocks = []   # (logical_start, compressed_start)
    with open(bam_path, "rb") as fh:
        raw = fh.read()
    pos = 0
    logical = 0
    while pos < len(raw) - len(BGZF_EOF):
        xlen = struct.unpack_from("<H", raw, pos + 10)[0]
        bsize = None
        xoff = pos + 12
        xend = xoff + xlen
        while xoff < xend:
            si1, si2, slen = raw[xoff], raw[xoff + 1], struct.unpack_from(
                "<H", raw, xoff + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", raw, xoff + 4)[0] + 1
            xoff += 4 + slen
        isize = struct.unpack_from("<I", raw, pos + bsize - 4)[0]
        blocks.append((logical, pos))
        logical += isize
        pos += bsize

    def voffset(logical_off: int) -> int:
        import bisect
        i = bisect.bisect_right([b[0] for b in blocks], logical_off) - 1
        lstart, cstart = blocks[i]
        return (cstart << 16) | (logical_off - lstart)

    bf = BamFile(bam_path)
    n_ref = len(bf.ref_names)
    bins: list[dict] = [dict() for _ in range(n_ref)]
    intervals: list[list] = [[] for _ in range(n_ref)]
    off = bf._off
    data = bf._data
    while off + 4 <= len(data):
        start_v = voffset(off)
        bs = struct.unpack_from("<i", data, off)[0]
        body = data[off + 4: off + 4 + bs]
        off += 4 + bs
        end_v = voffset(off)
        refid, pos2 = struct.unpack_from("<ii", body, 0)
        if refid < 0 or pos2 < 0:
            continue
        n_cig = struct.unpack_from("<H", body, 12)[0]
        l_name = body[8]
        cig_off = 32 + l_name
        span = 0
        for k in range(n_cig):
            v = struct.unpack_from("<I", body, cig_off + 4 * k)[0]
            if CIGAR_OPS[v & 0xF] in "MDN=X":
                span += v >> 4
        end = pos2 + max(span, 1)
        b = reg2bin(pos2, end)
        bins[refid].setdefault(b, []).append((start_v, end_v))
        iv = intervals[refid]
        for w in range(pos2 >> 14, (end - 1 >> 14) + 1):
            while len(iv) <= w:
                iv.append(0)
            if iv[w] == 0 or start_v < iv[w]:
                iv[w] = start_v

    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)
    for r in range(n_ref):
        out += struct.pack("<i", len(bins[r]))
        for b, chunks in sorted(bins[r].items()):
            merged = []
            for c in chunks:
                if merged and merged[-1][1] == c[0]:
                    merged[-1] = (merged[-1][0], c[1])
                else:
                    merged.append(c)
            out += struct.pack("<Ii", b, len(merged))
            for s, e in merged:
                out += struct.pack("<QQ", s, e)
        iv = intervals[r]
        for w in range(1, len(iv)):
            if iv[w] == 0:
                iv[w] = iv[w - 1]
        out += struct.pack("<i", len(iv))
        for v in iv:
            out += struct.pack("<Q", v)
    with open(bam_path + ".bai", "wb") as fh:
        fh.write(bytes(out))
    return bam_path + ".bai"


# ---------------------------------------------------------------------------
# SAM/BAM read input (reads.cpp:119-143)
# ---------------------------------------------------------------------------

class BamReadStream:
    """Reads aligner input from SAM/BAM files with the reference's mate
    interleaving: readset 1 takes records 0,2,4..., readset 2 takes
    1,3,5...; the 0x40/0x80 flags override the readset (reads.cpp:131-135).
    """

    def __init__(self, path: str, param, readset: int):
        self.param = param
        self.readset = readset
        self.index = param.read_start - 1
        if path.lower().endswith(".bam") or _is_bgzf(path):
            self._iter = self._bam_iter(path)
        else:
            self._iter = self._sam_iter(path)
        skip = param.read_start - 1
        if readset != 0:
            skip *= 2
        for _ in range(skip):
            if next(self._iter, None) is None:
                break

    def _bam_iter(self, path):
        bf = BamFile(path)
        for body in bf.records():
            (refid, pos, name, flag, mapq, cigar, mrefid, mpos, tlen, seq,
             qual, aux) = decode_record(body)
            q = "".join(chr(min(c, 93) + 33) for c in qual)
            yield name, flag, seq, q

    def _sam_iter(self, path):
        for line in open(path):
            if line.startswith("@"):
                continue
            col = line.rstrip("\n").split("\t")
            yield col[0], int(col[1]), col[9], col[10]

    def _next_record(self):
        from .readio import Read
        p = self.param
        if self.index >= p.read_end:
            return None
        if self.readset == 2:
            if next(self._iter, None) is None:
                return None
        rec = next(self._iter, None)
        if rec is None:
            return None
        name, flag, seq, qual = rec
        if self.readset == 1:
            next(self._iter, None)   # skip the mate record
        rs = self.readset
        if rs:
            if flag & 0x40:
                rs = 1
            elif flag & 0x80:
                rs = 2
        seq = seq[: p.max_readlen]
        qual = qual[: p.max_readlen]
        r = Read(index=self.index, readset=rs, name=name, seq=seq,
                 qual=qual)
        self.index += 1
        return r

    def next_batch(self, n: int):
        out = []
        for _ in range(n):
            r = self._next_record()
            if r is None:
                break
            out.append(r)
        return out

    def close(self) -> None:
        pass


def _is_bgzf(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(2) == b"\x1f\x8b"
