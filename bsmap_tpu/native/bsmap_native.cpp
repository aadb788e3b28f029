// Native host runtime for bsmap_tpu: FASTQ/FASTA block parsing, read
// encoding and SAM block formatting.
//
// The reference's host side is C++ (reads.cpp tokenized ingestion,
// align.cpp:631-765 output formatting); at TPU kernel speeds (>1M reads/s)
// the Python equivalents dominate the wall clock, so these stages are
// native here too.  Exposed as a plain C ABI consumed via ctypes
// (bsmap_tpu/native/__init__.py); all arrays are caller-allocated numpy
// buffers.
//
// Parsing reproduces the reference's istream token semantics exactly
// (reads.cpp:83-146): `fin >> tok` reads one whitespace-delimited token
// (possibly crossing line boundaries) and `getline` discards the remainder
// of the current line.  A record is only emitted when every token is
// provably complete inside the buffer (or `is_final` says the buffer ends
// the file), so callers can stream the file in arbitrary chunks.

#include <cstdint>
#include <cstring>

static inline bool is_ws(uint8_t c) {
    // istream skips isspace() (reads.cpp uses default-locale streams)
    return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\v' ||
           c == '\f';
}

extern "C" {

// Parse up to `cap` reads from buf[0:len].
// rec layout per read (int64 x 6): name_off, name_len, seq_off, seq_len,
// qual_off (-1 = synthetic FASTA quality), qual_len.
// Returns the number of complete records; *consumed = stream position
// after the last record's final token (the rest of its line is discarded
// by the NEXT record's getline, mirroring the reference's stream state).
int64_t bsmap_parse_reads(const uint8_t* buf, int64_t len, int is_final,
                          int is_fasta, int64_t max_readlen, int64_t cap,
                          int64_t* rec, int64_t* consumed) {
    int64_t p = 0, n = 0;
    *consumed = 0;
    while (n < cap) {
        int64_t q = p;
        while (q < len && is_ws(buf[q])) q++;   // get_char: skip whitespace
        if (q >= len) {
            if (is_final) *consumed = len;
            break;
        }
        q++;                                    // consume the marker char
        while (q < len && is_ws(buf[q])) q++;   // name token
        if (q >= len) break;
        int64_t name_off = q;
        while (q < len && !is_ws(buf[q])) q++;
        if (q >= len && !is_final) break;
        int64_t name_len = q - name_off;
        while (q < len && buf[q] != '\n') q++;  // getline
        if (q < len) q++;
        else if (!is_final) break;
        while (q < len && is_ws(buf[q])) q++;   // seq token
        if (q >= len) break;
        int64_t seq_off = q;
        while (q < len && !is_ws(buf[q])) q++;
        if (q >= len && !is_final) break;
        int64_t seq_len = q - seq_off;
        int64_t qual_off = -1, qual_len = seq_len;
        if (!is_fasta) {
            while (q < len && is_ws(buf[q])) q++;    // '+' token
            if (q >= len) break;
            while (q < len && !is_ws(buf[q])) q++;
            if (q >= len && !is_final) break;
            while (q < len && buf[q] != '\n') q++;   // getline
            if (q < len) q++;
            else if (!is_final) break;
            while (q < len && is_ws(buf[q])) q++;    // qual token
            if (q >= len) break;
            qual_off = q;
            while (q < len && !is_ws(buf[q])) q++;
            if (q >= len && !is_final) break;
            qual_len = q - qual_off;
        }
        if (seq_len > max_readlen) {            // -L truncation
            seq_len = max_readlen;              // (reads.cpp:115-117)
            if (qual_len > max_readlen) qual_len = max_readlen;
        }
        rec[n * 6 + 0] = name_off;
        rec[n * 6 + 1] = name_len;
        rec[n * 6 + 2] = seq_off;
        rec[n * 6 + 3] = seq_len;
        rec[n * 6 + 4] = qual_off;
        rec[n * 6 + 5] = qual_len;
        n++;
        p = q;
        *consumed = p;
    }
    return n;
}

// Encode a parsed block: 2-bit alphabet codes + valid-base mask into
// caller-zeroed (n, fixsize) arrays, plus per-read length and N-count
// (FilterReads' CountNs, align.cpp:48).
void bsmap_encode_block(const uint8_t* buf, const int64_t* rec, int64_t n,
                        const uint8_t* alphabet, const uint8_t* reg_alphabet,
                        int64_t fixsize, uint8_t* codes, uint8_t* regs,
                        int32_t* lens, int32_t* ncnt) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* s = buf + rec[i * 6 + 2];
        int64_t L = rec[i * 6 + 3];
        if (L > fixsize) L = fixsize;
        uint8_t* c = codes + i * fixsize;
        uint8_t* r = regs + i * fixsize;
        int32_t bad = 0;
        for (int64_t k = 0; k < L; k++) {
            uint8_t b = s[k];
            c[k] = alphabet[b];
            uint8_t g = reg_alphabet[b];
            r[k] = g;
            bad += (g == 0);
        }
        lens[i] = (int32_t)L;
        ncnt[i] = bad;
    }
}

// Encode a parsed block straight into the device dispatch row layout:
// int32 (n, 2*nwords + 4) rows = [read 2-bit-packed words | valid-mask
// words (lanes 11 valid / 00 invalid) | len | 0 | 0 | ncnt].  First base in
// the top bits of word 0 (dbseq.cpp:71-75 layout) — exactly the `qw`/`rw`
// arrays the device kernel's verify stage consumes, so the device never
// touches per-base codes.  Columns 2*nwords+1..2 (budget, rand32) are
// filled by the Python caller; ncnt rides in the maxrank slot until the
// caller overwrites it.
void bsmap_encode_block_words(const uint8_t* buf, const int64_t* rec,
                              int64_t n, const uint8_t* alphabet,
                              const uint8_t* reg_alphabet, int64_t nwords,
                              int32_t* rows) {
    const int64_t stride = 2 * nwords + 4;
    const int64_t fixsize = nwords * 16;
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* s = buf + rec[i * 6 + 2];
        int64_t L = rec[i * 6 + 3];
        if (L > fixsize) L = fixsize;
        uint32_t* q = (uint32_t*)(rows + i * stride);
        uint32_t* r = q + nwords;
        int32_t bad = 0;
        uint32_t qa = 0, ra = 0;
        int64_t w = 0, k = 0;
        for (; k < L; k++) {
            uint8_t b = s[k];
            uint8_t g = reg_alphabet[b];
            qa = (qa << 2) | alphabet[b];
            ra = (ra << 2) | g;
            bad += (g == 0);
            if ((k & 15) == 15) { q[w] = qa; r[w] = ra; w++; qa = ra = 0; }
        }
        if (k & 15) {
            int sh = 2 * (16 - (k & 15));
            q[w] = qa << sh; r[w] = ra << sh; w++;
        }
        for (; w < nwords; w++) { q[w] = 0; r[w] = 0; }
        rows[i * stride + 2 * nwords] = (int32_t)L;
        rows[i * stride + 2 * nwords + 1] = 0;
        rows[i * stride + 2 * nwords + 2] = 0;
        rows[i * stride + 2 * nwords + 3] = bad;
    }
}

// Two-pass WGBS seed-index build (the dbseq.cpp:327-514 count-then-fill
// pattern; replaces the numpy global argsort, whose peak memory at
// human-genome scale is several times the index itself).
//
// blocks: (nb, 4) int64 rows [parity, chr, begin, end], pre-ordered by the
// caller exactly as the enumeration requires (Watson blocks in (id, begin)
// order first, then Crick: dbseq.cpp:441-480).  begin/end are chr-local.
// pass 1 fills counts[3^S] (and wcounts for Watson blocks); pass 2 scatters
// global per-strand coordinates into locs at offsets[seed] + cursor.
// Seeds roll forward by index_interval digits per sample (base-3, T->C
// collapsed lanes) instead of recomputing all S digits.
static inline int64_t seed_at(const uint32_t* base, int64_t pos, int64_t S) {
    int64_t v = 0;
    for (int64_t k = 0; k < S; k++) {
        int64_t p = pos + k;
        uint32_t c = (base[p >> 4] >> (2 * (15 - (p & 15)))) & 3u;
        v = v * 3 + (c == 3u ? 1u : c);
    }
    return v;
}

void bsmap_index_pass(const uint32_t* refcat, const uint32_t* crefcat,
                      const int64_t* chr_w0, const int64_t* anchors,
                      const int64_t* blocks, int64_t nb,
                      int64_t S, int64_t I, int32_t pass,
                      uint32_t* counts, uint32_t* wcounts,
                      const int64_t* offsets, int64_t* cursors,
                      uint32_t* locs) {
    int64_t pow_hi = 1;                      // 3^(S-I)
    for (int64_t k = 0; k < S - I; k++) pow_hi *= 3;
    for (int64_t b = 0; b < nb; b++) {
        int64_t parity = blocks[b * 4 + 0];
        int64_t chr = blocks[b * 4 + 1];
        int64_t begin = blocks[b * 4 + 2];
        int64_t end = blocks[b * 4 + 3];
        int64_t i0 = (begin / I) * I;
        int64_t i2 = ((end - S) / I) * I;
        if (i2 < i0) continue;
        const uint32_t* base =
            (parity ? crefcat : refcat) + chr_w0[chr];
        int64_t anchor = anchors[chr];
        int64_t v = seed_at(base, i0, S);
        for (int64_t pos = i0;; pos += I) {
            if (pass == 1) {
                counts[v]++;
                if (parity == 0) wcounts[v]++;
            } else {
                locs[offsets[v] + cursors[v]++] = (uint32_t)(anchor + pos);
            }
            if (pos + I > i2) break;
            if (I < S) {
                v %= pow_hi;                 // roll I digits forward
                for (int64_t j = 0; j < I; j++) {
                    int64_t p = pos + S + j;
                    uint32_t c =
                        (base[p >> 4] >> (2 * (15 - (p & 15)))) & 3u;
                    v = v * 3 + (c == 3u ? 1u : c);
                }
            } else {
                v = seed_at(base, pos + I, S);
            }
        }
    }
}

static inline uint8_t* put_u32(uint8_t* o, uint32_t v) {
    char tmp[10];
    int k = 0;
    do {
        tmp[k++] = '0' + (v % 10);
        v /= 10;
    } while (v);
    while (k) *o++ = tmp[--k];
    return o;
}

static inline uint8_t* put_str(uint8_t* o, const char* s) {
    while (*s) *o++ = (uint8_t)*s++;
    return o;
}

// Reference-context string (XR tag / BSP column 9; align.cpp:670-688):
// 2 lowercase flank chars + the read span + 2 lowercase, decoded from the
// CONCATENATED Watson packing (pointer arithmetic reads straight past the
// chromosome end like the reference).  mapseq is a persistent 256-byte
// buffer whose leading slots keep their previous content when loc < 2 (the
// reference's ptr advances on `continue`: align.cpp:673).
// Returns the context length (read_len + 4).
static inline int64_t ref_context(const uint32_t* refcat, int64_t total_codes,
                                  const int64_t* anchors, const char* un,
                                  uint8_t* mapseq, int64_t chrp, int64_t loc,
                                  int64_t read_len) {
    int64_t anchor = anchors[chrp >> 1];
    int64_t ptr = 0;
    for (int64_t ii = 2; ii >= 1; ii--) {
        if (loc >= ii) {
            int64_t g = anchor + loc - ii;
            uint32_t c = (g >= 0 && g < total_codes)
                ? ((refcat[g >> 4] >> (2 * (15 - (g & 15)))) & 3u) : 0u;
            mapseq[ptr] = (uint8_t)(un[c] + 32);
        }
        ptr++;
    }
    for (int64_t ii = 0; ii < read_len + 2; ii++) {
        int64_t g = anchor + loc + ii;
        uint32_t c = (g >= 0 && g < total_codes)
            ? ((refcat[g >> 4] >> (2 * (15 - (g & 15)))) & 3u) : 0u;
        mapseq[ptr++] = (uint8_t)un[c];
    }
    mapseq[ptr - 1] += 32;
    mapseq[ptr - 2] += 32;
    return ptr;
}

// Format one block of SE SAM lines (s_OutHit SAM branch, align.cpp:631-765;
// no RRBS tags — callers route -D runs to the exact Python path).
//
// status per read: 0 = skip (formatted by the caller: replays/BSP),
//                  1 = QC-filtered, 2 = device result row.
// rows: (n, 2) int32 lean rows: word 0 = watson loc, word 1 = packed bits
// (device_engine.BIT_* layout: found|chain<<1|replay<<2|ok<<3|big<<4|
//  multi<<5|ii<<6|chrp<<10).
// Returns bytes written, or -1 if out_cap could be exceeded (caller grows
// the buffer and retries).  line_off (n+1 int64) gets per-read output
// offsets so the caller can splice Python-formatted reads in order.
int64_t bsmap_format_sam_block_xr(
    const uint8_t* buf, const int64_t* rec, int64_t n, const int32_t* status,
    const int32_t* rows, const uint8_t* chrnames, const int64_t* chrname_off,
    const uint8_t* revc, int32_t flag_base, int32_t out_unmap, int32_t rrhits,
    uint8_t synth_qual, int32_t out_ref, const uint32_t* refcat,
    int64_t total_codes, const int64_t* anchors, const char* useful_nt,
    uint8_t* mapseq, uint8_t* out, int64_t out_cap, int64_t* line_off,
    int64_t* n_aligned);

int64_t bsmap_format_sam_block(
    const uint8_t* buf, const int64_t* rec, int64_t n, const int32_t* status,
    const int32_t* rows,
    const uint8_t* chrnames, const int64_t* chrname_off,
    const uint8_t* revc,           // 256-entry complement table
    int32_t flag_base, int32_t out_unmap, int32_t rrhits,
    uint8_t synth_qual, uint8_t* out, int64_t out_cap,
    int64_t* line_off, int64_t* n_aligned) {
    return bsmap_format_sam_block_xr(
        buf, rec, n, status, rows, chrnames, chrname_off, revc, flag_base,
        out_unmap, rrhits, synth_qual, 0, 0, 0, 0, 0, 0, out, out_cap,
        line_off, n_aligned);
}

// SAM block formatter with optional XR:Z: reference-context tag (-R,
// align.cpp:684).  refcat/anchors/useful_nt/mapseq may be null when
// out_ref == 0; mapseq is the caller-held persistent 256-byte context
// buffer (stale-slot quirk, see ref_context).
int64_t bsmap_format_sam_block_xr(
    const uint8_t* buf, const int64_t* rec, int64_t n, const int32_t* status,
    const int32_t* rows,
    const uint8_t* chrnames, const int64_t* chrname_off,
    const uint8_t* revc,
    int32_t flag_base, int32_t out_unmap, int32_t rrhits,
    uint8_t synth_qual, int32_t out_ref,
    const uint32_t* refcat, int64_t total_codes, const int64_t* anchors,
    const char* useful_nt, uint8_t* mapseq,
    uint8_t* out, int64_t out_cap,
    int64_t* line_off, int64_t* n_aligned) {
    uint8_t* o = out;
    int64_t aligned = 0;
    for (int64_t i = 0; i < n; i++) {
        line_off[i] = o - out;
        int32_t st = status[i];
        if (st == 0) continue;
        // QC lines are suppressed entirely under -r 0 (string_align's outer
        // report_repeat_hits guard, output/sam.py:88-93)
        if (st == 1 && rrhits == 0) continue;
        const int64_t* r = rec + i * 6;
        int64_t name_off = r[0], name_len = r[1];
        int64_t seq_off = r[2], seq_len = r[3];
        int64_t qual_off = r[4], qual_len = r[5];
        if (out_cap - (o - out) <
            name_len + 3 * seq_len + qual_len + 128)
            return -1;
        int32_t wloc = rows[i * 2], w1 = rows[i * 2 + 1];
        int32_t found = w1 & 1, chain = (w1 >> 1) & 1, multi = (w1 >> 5) & 1;
        int32_t level = (w1 >> 6) & 15, chrp = (w1 >> 10) & 0xFFFF;
        uint32_t flag = (uint32_t)flag_base;
        bool mapped = (st == 2) && found;
        if (st == 1) flag |= 0x204;                       // QC (align.cpp:641)
        else if (!found) flag |= 0x4;                     // NM
        else if (multi && rrhits == 0) flag |= 0x104;     // suppressed multi
        else {
            if (multi) flag |= 0x100;
            if ((chain ^ (chrp & 1)) != 0) flag |= 0x10;
        }
        if (!mapped || (multi && rrhits == 0)) {
            if (!out_unmap) continue;
            memcpy(o, buf + name_off, name_len); o += name_len;
            *o++ = '\t'; o = put_u32(o, flag);
            o = put_str(o, "\t*\t0\t0\t*\t*\t0\t0\t");
            memcpy(o, buf + seq_off, seq_len); o += seq_len;
            *o++ = '\t';
            if (qual_off < 0) { memset(o, synth_qual, seq_len); o += seq_len; }
            else { memcpy(o, buf + qual_off, qual_len); o += qual_len; }
            *o++ = '\n';
            continue;
        }
        aligned++;
        memcpy(o, buf + name_off, name_len); o += name_len;
        *o++ = '\t'; o = put_u32(o, flag); *o++ = '\t';
        int64_t c2 = chrp >> 1;
        int64_t cl = chrname_off[c2 + 1] - chrname_off[c2];
        memcpy(o, chrnames + chrname_off[c2], cl); o += cl;
        *o++ = '\t'; o = put_u32(o, (uint32_t)(wloc + 1));
        o = put_str(o, "\t255\t"); o = put_u32(o, (uint32_t)seq_len);
        o = put_str(o, "M\t*\t0\t0\t");
        const uint8_t* s = buf + seq_off;
        if (flag & 0x10) {
            for (int64_t k = seq_len - 1; k >= 0; k--) *o++ = revc[s[k]];
            *o++ = '\t';
            if (qual_off < 0) { memset(o, synth_qual, seq_len); o += seq_len; }
            else {
                const uint8_t* qs = buf + qual_off;
                for (int64_t k = qual_len - 1; k >= 0; k--) *o++ = qs[k];
            }
        } else {
            memcpy(o, s, seq_len); o += seq_len;
            *o++ = '\t';
            if (qual_off < 0) { memset(o, synth_qual, seq_len); o += seq_len; }
            else { memcpy(o, buf + qual_off, qual_len); o += qual_len; }
        }
        o = put_str(o, "\tNM:i:"); o = put_u32(o, (uint32_t)level);
        if (out_ref) {
            o = put_str(o, "\tXR:Z:");
            int64_t cl2 = ref_context(refcat, total_codes, anchors,
                                      useful_nt, mapseq, chrp, wloc,
                                      seq_len);
            memcpy(o, mapseq, cl2); o += cl2;
        }
        o = put_str(o, "\tZS:Z:");
        *o++ = (chrp & 1) ? '-' : '+';
        *o++ = chain ? '-' : '+';
        *o++ = '\n';
    }
    line_off[n] = o - out;
    *n_aligned += aligned;
    return o - out;
}

// Format one block of SE BSP lines (s_OutHit BSP branch, align.cpp:723-760).
// rows are FULL kernel result rows, (n, 2*maxseg + n_extras) int32:
// [per-level (fwd, rc) count pairs | extras], plus synthesized rows for
// host-replayed reads — every read is a row here (no text splicing).
// extras columns used: found, ii, ssum, chain, chrp, wloc (device_engine
// X_* order).  status: 1 = QC-filtered, 2 = result row, 0 = skip.
int64_t bsmap_format_bsp_block(
    const uint8_t* buf, const int64_t* rec, int64_t n, const int32_t* status,
    const int32_t* rows, int64_t row_w, int64_t maxseg,
    const uint8_t* chrnames, const int64_t* chrname_off,
    const uint8_t* revc, int32_t out_unmap, int32_t rrhits,
    int32_t max_snp_num, int32_t max_num_hits, uint8_t synth_qual,
    const uint32_t* refcat, int64_t total_codes, const int64_t* anchors,
    const char* useful_nt, uint8_t* mapseq,
    uint8_t* out, int64_t out_cap, int64_t* line_off, int64_t* n_aligned) {
    uint8_t* o = out;
    int64_t aligned = 0;
    for (int64_t i = 0; i < n; i++) {
        line_off[i] = o - out;
        int32_t st = status[i];
        if (st == 0) continue;
        // filtered reads emit nothing at all under -r 0 (string_align's
        // outer report_repeat_hits guard, align.cpp:599 path)
        if (st == 1 && rrhits == 0) continue;
        const int64_t* r = rec + i * 6;
        int64_t name_off = r[0], name_len = r[1];
        int64_t seq_off = r[2], seq_len = r[3];
        int64_t qual_off = r[4], qual_len = r[5];
        if (out_cap - (o - out) <
            name_len + 3 * seq_len + qual_len + 256)
            return -1;
        const int32_t* row = rows + i * row_w;
        const int32_t* ex = row + 2 * maxseg;
        // extras order: found, ii, ssum, chain, chrp, wloc (X_FOUND..X_WLOC)
        int32_t found = ex[0], level = ex[1], ssum = ex[2];
        int32_t chain = ex[3], chrp = ex[4], wloc = ex[5];
        int64_t nn = (st == 1) ? -1 : (found ? ssum : 0);
        // suppressed lines (out_unmap off): QC/NM and -r 0 multi
        if (!out_unmap && (nn <= 0 || (nn > 1 && rrhits == 0))) continue;
        memcpy(o, buf + name_off, name_len); o += name_len;
        *o++ = '\t';
        bool rc = nn > 0 && ((chain ^ (chrp & 1)) != 0);
        const uint8_t* s = buf + seq_off;
        if (rc) {
            for (int64_t k = seq_len - 1; k >= 0; k--) *o++ = revc[s[k]];
        } else {
            memcpy(o, s, seq_len); o += seq_len;
        }
        *o++ = '\t';
        if (qual_off < 0) { memset(o, synth_qual, seq_len); o += seq_len; }
        else if (rc) {
            const uint8_t* qs = buf + qual_off;
            for (int64_t k = qual_len - 1; k >= 0; k--) *o++ = qs[k];
        } else { memcpy(o, buf + qual_off, qual_len); o += qual_len; }
        *o++ = '\t';
        const char* cls = (nn < 0) ? "QC" : (nn == 0) ? "NM"
            : (nn == 1) ? "UM" : (nn >= max_num_hits) ? "OF" : "MA";
        *o++ = cls[0]; *o++ = cls[1];
        if ((nn > 0 && rrhits == 1) || (nn == 1 && rrhits == 0)) {
            aligned++;
            *o++ = '\t';
            int64_t c2 = chrp >> 1;
            int64_t cl = chrname_off[c2 + 1] - chrname_off[c2];
            memcpy(o, chrnames + chrname_off[c2], cl); o += cl;
            *o++ = '\t'; o = put_u32(o, (uint32_t)(wloc + 1));
            *o++ = '\t';
            *o++ = (chrp & 1) ? '-' : '+';
            *o++ = chain ? '-' : '+';
            o = put_str(o, "\t0\t");          // SE insert size
            int64_t cl2 = ref_context(refcat, total_codes, anchors,
                                      useful_nt, mapseq, chrp, wloc,
                                      seq_len);
            memcpy(o, mapseq, cl2); o += cl2;
            *o++ = '\t'; o = put_u32(o, (uint32_t)level); *o++ = '\t';
            int64_t budget = (int64_t)(max_snp_num + 1) * (seq_len - 1)
                / (seq_len > 0 ? seq_len : 1);
            for (int64_t ii = 0; ii <= budget; ii++) {
                if (ii) *o++ = ':';
                uint32_t h = (ii < maxseg)
                    ? (uint32_t)(row[2 * ii] + row[2 * ii + 1]) : 0u;
                o = put_u32(o, h);
            }
        }
        *o++ = '\n';
    }
    line_off[n] = o - out;
    *n_aligned += aligned;
    return o - out;
}

}  // extern "C"
