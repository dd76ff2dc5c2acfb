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

// Pass 1: count records and total sequence bytes (newlines/whitespace stripped).
void fasta_scan(const uint8_t* data, size_t n, int64_t* n_records, int64_t* total_seq_len) {
    int64_t records = 0;
    int64_t seq_len = 0;
    size_t i = 0;
    while (i < n) {
        if (data[i] == '>') {
            records++;
            while (i < n && data[i] != '\n') i++;  // skip header line
            i++;
        } else {
            uint8_t c = data[i];
            if (c != '\n' && c != '\r' && c != ' ' && c != '\t') seq_len++;
            i++;
        }
    }
    *n_records = records;
    *total_seq_len = seq_len;
}

// Pass 2: fill packed sequence/name buffers and per-record offsets/lengths.
// Names are truncated at the first whitespace (standard FASTA id convention).
// Returns 0 on success, -1 if name buffer capacity is exceeded.
int fasta_parse(const uint8_t* data, size_t n,
                uint8_t* seq_out, uint8_t* name_out, int64_t name_cap,
                int64_t* seq_offsets, int64_t* seq_lengths,
                int64_t* name_offsets, int64_t* name_lengths) {
    int64_t rec = -1;
    int64_t seq_pos = 0;
    int64_t name_pos = 0;
    size_t i = 0;
    while (i < n) {
        if (data[i] == '>') {
            if (rec >= 0) seq_lengths[rec] = seq_pos - seq_offsets[rec];
            rec++;
            i++;
            name_offsets[rec] = name_pos;
            while (i < n && data[i] != '\n' && data[i] != ' ' && data[i] != '\t' && data[i] != '\r') {
                if (name_pos >= name_cap) return -1;
                name_out[name_pos++] = data[i++];
            }
            name_lengths[rec] = name_pos - name_offsets[rec];
            while (i < n && data[i] != '\n') i++;  // rest of header
            i++;
            seq_offsets[rec] = seq_pos;
        } else {
            uint8_t c = data[i];
            if (c != '\n' && c != '\r' && c != ' ' && c != '\t') seq_out[seq_pos++] = c;
            i++;
        }
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

}  // extern "C"
