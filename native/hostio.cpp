// Native host-side I/O kernels for kaptive-tpu.
//
// Replaces the data-loader role of the reference's Rust rammappy FASTA parser
// (/root/reference/src/kaptive/core/genome.py:44-46) for the multi-host
// streaming input pipeline: FASTA parsing and 2-bit DNA encoding at memory
// bandwidth, so CPU-side ingest never starves the TPU.
//
// C ABI (ctypes-friendly), two-pass usage:
//   1. fasta_scan(data, n, &n_records, &total_seq_len)
//   2. caller allocates output buffers
//   3. fasta_parse(data, n, seq_out, name_out, name_cap,
//                  seq_offsets, seq_lengths, name_offsets, name_lengths)
//
// encode_dna_2bit(data, n, out): byte -> {A,a:0 C,c:1 G,g:2 T,t/U,u:3 else 4}.

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// Line framing via memchr (SIMD in libc): returns the line's exclusive end.
static inline size_t line_end_of(const uint8_t* data, size_t n, size_t i) {
    const uint8_t* nl = (const uint8_t*)memchr(data + i, '\n', n - i);
    return nl ? (size_t)(nl - data) : n;
}

// Whitespace a sequence line may carry (stripped): \r, space, tab.
static inline bool line_has_ws(const uint8_t* q, size_t len) {
    return memchr(q, '\r', len) || memchr(q, ' ', len) || memchr(q, '\t', len);
}

// Pass 1: count records and total sequence bytes (newlines/whitespace
// stripped).  memchr-framed lines: clean sequence lines (the overwhelming
// case) cost three SIMD scans and one length add instead of a byte loop.
void fasta_scan(const uint8_t* data, size_t n, int64_t* n_records, int64_t* total_seq_len) {
    int64_t records = 0;
    int64_t seq_len = 0;
    size_t i = 0;
    while (i < n) {
        const size_t end = line_end_of(data, n, i);
        if (data[i] == '>') {
            records++;
        } else {
            size_t len = end - i;
            if (line_has_ws(data + i, len)) {
                for (size_t j = i; j < end; j++) {
                    uint8_t c = data[j];
                    len -= (c == '\r' || c == ' ' || c == '\t');
                }
            }
            seq_len += (int64_t)len;
        }
        i = end + 1;
    }
    *n_records = records;
    *total_seq_len = seq_len;
}

// Pass 2: fill packed sequence/name buffers and per-record offsets/lengths.
// Names are truncated at the first whitespace (standard FASTA id convention).
// Clean sequence lines memcpy wholesale.  Returns 0 on success, -1 if name
// buffer capacity is exceeded.
int fasta_parse(const uint8_t* data, size_t n,
                uint8_t* seq_out, uint8_t* name_out, int64_t name_cap,
                int64_t* seq_offsets, int64_t* seq_lengths,
                int64_t* name_offsets, int64_t* name_lengths) {
    int64_t rec = -1;
    int64_t seq_pos = 0;
    int64_t name_pos = 0;
    size_t i = 0;
    while (i < n) {
        const size_t end = line_end_of(data, n, i);
        if (data[i] == '>') {
            if (rec >= 0) seq_lengths[rec] = seq_pos - seq_offsets[rec];
            rec++;
            name_offsets[rec] = name_pos;
            size_t j = i + 1;
            while (j < end && data[j] != ' ' && data[j] != '\t' && data[j] != '\r') j++;
            const int64_t nlen = (int64_t)(j - (i + 1));
            if (name_pos + nlen > name_cap) return -1;
            memcpy(name_out + name_pos, data + i + 1, (size_t)nlen);
            name_pos += nlen;
            name_lengths[rec] = nlen;
            seq_offsets[rec] = seq_pos;
        } else {
            const size_t len = end - i;
            if (!line_has_ws(data + i, len)) {
                memcpy(seq_out + seq_pos, data + i, len);
                seq_pos += (int64_t)len;
            } else {
                for (size_t j = i; j < end; j++) {
                    uint8_t c = data[j];
                    if (c != '\r' && c != ' ' && c != '\t') seq_out[seq_pos++] = c;
                }
            }
        }
        i = end + 1;
    }
    if (rec >= 0) seq_lengths[rec] = seq_pos - seq_offsets[rec];
    return 0;
}

// Byte -> 2-bit code LUT encode (A0 C1 G2 T/U3, else 4).
static const uint8_t* dna_lut() {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, 4, sizeof(lut));
        lut['A'] = lut['a'] = 0;
        lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2;
        lut['T'] = lut['t'] = 3;
        lut['U'] = lut['u'] = 3;
        init = true;
    }
    return lut;
}

void encode_dna_2bit(const uint8_t* data, size_t n, uint8_t* out) {
    const uint8_t* lut = dna_lut();
    for (size_t i = 0; i < n; i++) out[i] = lut[data[i]];
}

// Fused contig-stream build: encode contig bytes, concatenate with `gap`
// sentinel codes between contigs into a pre-sized flat buffer (caller pads
// the allocation with sentinels), 2-bit-pack the real prefix 4 codes/byte
// (sentinels pack as 0), and record invalid-base positions (the sparse
// device upload's exception list).  One pass per output instead of four
// numpy passes on the ingest threads.
//
//   flat_out:   [alloc] uint8, PRE-FILLED with 4 by the caller
//   packed_out: [packed_len] uint8 with packed_len = (real_len + 3) / 4,
//               real_len = sum(lengths) + gap * (n_seqs - 1)
//   exc_out:    [exc_cap] int32 exception positions
// Returns the exception count (may exceed exc_cap: only the first exc_cap
// are written; callers treat overflow as "use the dense form").
int64_t build_contig_stream(const uint8_t* seq, const int64_t* offsets,
                            const int64_t* lengths, int64_t n_seqs, int64_t gap,
                            uint8_t* flat_out, uint8_t* packed_out,
                            int32_t* exc_out, int64_t exc_cap) {
    const uint8_t* lut = dna_lut();
    int64_t pos = 0;
    int64_t n_exc = 0;
    uint8_t acc = 0;
    for (int64_t s = 0; s < n_seqs; s++) {
        const uint8_t* src = seq + offsets[s];
        const int64_t len = lengths[s];
        for (int64_t i = 0; i < len; i++) {
            uint8_t code = lut[src[i]];
            flat_out[pos] = code;
            if (code >= 4) {
                if (n_exc < exc_cap) exc_out[n_exc] = (int32_t)pos;
                n_exc++;
                code = 0;  // sentinels pack as 0
            }
            acc |= (uint8_t)(code << ((pos & 3) * 2));
            if ((pos & 3) == 3) { packed_out[pos >> 2] = acc; acc = 0; }
            pos++;
        }
        if (s + 1 < n_seqs) {  // inter-contig sentinel gap (k-1 codes)
            for (int64_t g = 0; g < gap; g++) {
                if (n_exc < exc_cap) exc_out[n_exc] = (int32_t)pos;
                n_exc++;
                // flat_out already sentinel-filled; sentinel packs as 0
                if ((pos & 3) == 3) { packed_out[pos >> 2] = acc; acc = 0; }
                pos++;
            }
        }
    }
    if (pos & 3) packed_out[pos >> 2] = acc;
    return n_exc;
}

// Host seeding kernel: minimizer scan + sorted-table match in one C pass.
//
// Mirrors kaptive_tpu/ops/minimizer.py::minimizer_scan_host exactly (rolling
// 2-bit packed canonical k-mers, murmur3 32-bit finalizer, w-window minimum
// with leftmost-on-tie, invalid-base masking) and then expands each selected
// minimizer against the sorted gene-table hash array (lower/upper bound,
// occurrence count capped at max_occ) — the host half of the mapper's
// seed stage, so ingest threads can hand the device pre-seeded chains and the
// TPU spends its cycles on the DP sweeps instead of the gather-bound match.
//
//   codes:  [L] uint8 base codes (0-3 valid, >=4 sentinel), contig stream
//   table:  [T] uint32 sorted ascending canonical-minimizer hashes
//   out_ti / out_cpos / out_cstrand: [cap_out] anchor rows
//     (table row index, flat contig-stream position, contig strand bit)
//   out_counts: [2] -> {n_minimizers, n_candidates}
// Returns the total anchor count, which may exceed cap_out (only the first
// cap_out rows are written; callers treat overflow as "redo with a larger
// buffer" — the count is exact either way).
//   bloom: optional [1 << (bloom_bits - 5)] uint32 membership bitmap over the
//     table hashes (bit hash & (2^bloom_bits - 1)); NULL disables the gate.
//     One in-memory bit test replaces two binary searches for the ~99.5% of
//     genome minimizers that miss the gene table.
int64_t seed_anchors(const uint8_t* codes, int64_t L, int32_t k, int32_t w,
                     const uint32_t* table, int64_t T,
                     const uint32_t* bloom, int32_t bloom_bits,
                     int32_t max_occ, int64_t cap_out,
                     int32_t* out_ti, int32_t* out_cpos, uint8_t* out_cstrand,
                     int64_t* out_counts) {
    out_counts[0] = 0;
    out_counts[1] = 0;
    const int64_t nk = L - (int64_t)k + 1;   // k-mer start positions
    const int64_t nw = nk - (int64_t)w + 1;  // window start positions
    if (nk <= 0 || nw <= 0 || k > 16 || w < 1) return 0;

    const uint32_t MAXU = 0xFFFFFFFFu;
    const uint64_t MAXK = ~(uint64_t)0;
    const uint32_t mask = (k < 16) ? ((1u << (2 * k)) - 1) : MAXU;
    const int rev_shift = 2 * (k - 1);

    // Chunked van Herk / Gil-Werman sliding minimum over packed
    // (hash << 32 | position) keys: the u64 min gives the window's smallest
    // hash AND breaks ties on the smaller (leftmost) position in the same
    // comparison — matching numpy's `cand < best` scan — with ~3 branch-free
    // compares per element instead of a branchy monotonic deque (the deque
    // formulation measured ~3x slower; this loop auto-vectorizes).
    const int64_t CHUNK = 1 << 15;  // window starts per block
    const int64_t BUF = CHUNK + (int64_t)w;  // keys needed per block (w-1 carry)
    uint64_t* key = new uint64_t[BUF];
    uint64_t* pre = new uint64_t[BUF];   // running min from w-block start
    uint64_t* suf = new uint64_t[BUF];   // running min to w-block end
    uint8_t* strd = new uint8_t[BUF];

    uint32_t fwd = 0, rev = 0;
    int64_t last_bad = -1;
    int64_t scan_i = 0;      // next code index for the rolling registers
    int64_t last_emit = -1;  // dedupe: window argmins are non-decreasing
    int64_t n_min = 0, n_cand = 0, n_anch = 0;

    for (int64_t wstart = 0; wstart < nw; wstart += CHUNK) {
        const int64_t n_win = (nw - wstart < CHUNK) ? (nw - wstart) : CHUNK;
        const int64_t need = n_win + w - 1;  // k-mer starts [wstart, wstart+need)
        // Carry the previous block's last w-1 keys to the front.
        if (wstart > 0) {
            for (int64_t j = 0; j < w - 1; j++) {
                key[j] = key[CHUNK + j];
                strd[j] = strd[CHUNK + j];
            }
        }
        // Fill new keys by continuing the sequential rolling scan.
        const int64_t fill_from = (wstart > 0) ? w - 1 : 0;
        const int64_t p_end = wstart + need;  // exclusive k-mer position bound
        for (; scan_i < p_end + k - 1 && scan_i < L; scan_i++) {
            uint32_t c = codes[scan_i];
            if (c >= 4) { last_bad = scan_i; c = 0; }
            fwd = ((fwd << 2) | c) & mask;
            rev = (rev >> 2) | ((3u - c) << rev_shift);
            const int64_t p = scan_i - k + 1;
            if (p < wstart + fill_from) continue;
            uint64_t kk = MAXK;
            uint8_t strand = 1;
            if (last_bad < p) {
                uint32_t x = fwd < rev ? fwd : rev;
                strand = (uint8_t)(fwd <= rev);
                x ^= x >> 16; x *= 0x85EBCA6Bu;
                x ^= x >> 13; x *= 0xC2B2AE35u;
                x ^= x >> 16;
                kk = ((uint64_t)x << 32) | (uint64_t)(uint32_t)p;
            }
            const int64_t b = p - wstart;
            key[b] = kk;
            strd[b] = strand;
        }
        // Van Herk prefix/suffix mins over w-aligned blocks of the buffer.
        for (int64_t b0 = 0; b0 < need; b0 += w) {
            const int64_t b1 = (b0 + w < need) ? b0 + w : need;
            uint64_t m = key[b0];
            pre[b0] = m;
            for (int64_t j = b0 + 1; j < b1; j++) {
                const uint64_t v = key[j];
                m = v < m ? v : m;
                pre[j] = m;
            }
            m = key[b1 - 1];
            suf[b1 - 1] = m;
            for (int64_t j = b1 - 2; j >= b0; j--) {
                const uint64_t v = key[j];
                m = v < m ? v : m;
                suf[j] = m;
            }
        }
        // Window minima + match/emit for the sparse survivors.
        for (int64_t i = 0; i < n_win; i++) {
            const uint64_t a = suf[i];
            const uint64_t bb = pre[i + w - 1];
            const uint64_t m = bb < a ? bb : a;
            if ((m >> 32) == (uint64_t)MAXU) continue;  // all-invalid window
            const int64_t best = (int64_t)(uint32_t)m;
            if (best == last_emit) continue;
            last_emit = best;
            n_min++;
            const uint32_t bh = (uint32_t)(m >> 32);
            if (bloom) {  // membership gate: one bit test per minimizer
                const uint32_t bit = bh & ((1u << bloom_bits) - 1);
                if (!((bloom[bit >> 5] >> (bit & 31)) & 1)) continue;
            }
            // Sorted-table lookup: [lo, hi) = run of this hash.
            int64_t lo = 0, hi = T;
            while (lo < hi) {
                const int64_t mid = (lo + hi) >> 1;
                if (table[mid] < bh) lo = mid + 1; else hi = mid;
            }
            if (lo >= T || table[lo] != bh) continue;
            int64_t hi2 = lo, top = T;
            while (hi2 < top) {  // upper bound
                const int64_t mid = (hi2 + top) >> 1;
                if (table[mid] <= bh) hi2 = mid + 1; else top = mid;
            }
            n_cand++;
            int64_t cnt = hi2 - lo;
            if (cnt > max_occ) cnt = max_occ;
            const uint8_t bstrand = strd[best - wstart];
            for (int64_t j = 0; j < cnt; j++) {
                if (n_anch < cap_out) {
                    out_ti[n_anch] = (int32_t)(lo + j);
                    out_cpos[n_anch] = (int32_t)best;
                    out_cstrand[n_anch] = bstrand;
                }
                n_anch++;
            }
        }
    }
    delete[] key;
    delete[] pre;
    delete[] suf;
    delete[] strd;
    out_counts[0] = n_min;
    out_counts[1] = n_cand;
    return n_anch;
}

}  // extern "C"
