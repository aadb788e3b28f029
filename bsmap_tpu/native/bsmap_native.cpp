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

// Format one block of SE SAM lines (s_OutHit SAM branch, align.cpp:631-765;
// no XR/RRBS tags — callers route -R / -D runs to the exact Python path).
//
// status per read: 0 = skip (formatted by the caller: replays/BSP),
//                  1 = QC-filtered, 2 = device result row.
// rows: (n, 2) int32 lean rows: word 0 = watson loc, word 1 = packed bits
// (device_engine.BIT_* layout: found|chain<<1|replay<<2|ok<<3|big<<4|
//  multi<<5|ii<<6|chrp<<10).
// Returns bytes written, or -1 if out_cap could be exceeded (caller grows
// the buffer and retries).  line_off (n+1 int64) gets per-read output
// offsets so the caller can splice Python-formatted reads in order.
int64_t bsmap_format_sam_block(
    const uint8_t* buf, const int64_t* rec, int64_t n, const int32_t* status,
    const int32_t* rows,
    const uint8_t* chrnames, const int64_t* chrname_off,
    const uint8_t* revc,           // 256-entry complement table
    int32_t flag_base, int32_t out_unmap, int32_t rrhits,
    uint8_t synth_qual, uint8_t* out, int64_t out_cap,
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
        if (out_cap - (o - out) < name_len + 2 * seq_len + qual_len + 96)
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
        o = put_str(o, "\tZS:Z:");
        *o++ = (chrp & 1) ? '-' : '+';
        *o++ = chain ? '-' : '+';
        *o++ = '\n';
    }
    line_off[n] = o - out;
    *n_aligned += aligned;
    return o - out;
}

}  // extern "C"
