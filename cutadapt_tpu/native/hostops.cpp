// Native host-side kernels for the batched TPU engine.
//
// The TPU does the alignment DP; everything byte-level around it
// (FASTQ structure scan, the k-mer prefilter that decides which reads
// cross the wire, candidate gather/encode/pack, and trimmed-FASTQ
// assembly) is memory-bound host work implemented here.  Semantics
// mirror the pure-Python/NumPy implementations in
// cutadapt_tpu/batch.py and cutadapt_tpu/kmer_finder.py exactly
// (reference behaviour: /root/reference/src/cutadapt/_kmer_finder.pyx
// and dnaio's record chunking); the Python versions remain as
// fallbacks and as the oracle for the parity tests.
//
// Built as a plain shared library, loaded with ctypes (no pybind11 in
// this environment).

#include <cstdint>
#include <cstring>

extern "C" {

// --- FASTQ structure scan -------------------------------------------------
//
// Records are 4 lines: @head / seq / + / qual.  A missing final
// newline is tolerated (a virtual newline at end-of-buffer), CRLF line
// endings are tolerated per line.  Returns the number of records, or
//   -1  buffer does not contain a whole number of records
//   -2  a sequence and its quality line differ in length

int64_t fastq_count(const uint8_t* buf, int64_t n) {
    int64_t nl = 0;
    const uint8_t* p = buf;
    const uint8_t* end = buf + n;
    while ((p = (const uint8_t*)memchr(p, '\n', end - p)) != nullptr) {
        ++nl;
        ++p;
    }
    if (nl % 4 != 0) {
        if (n > 0 && buf[n - 1] != '\n') ++nl;  // virtual final newline
        if (nl % 4 != 0) return -1;
    }
    return nl / 4;
}

int64_t fastq_parse(const uint8_t* buf, int64_t n, int64_t n_records,
                    int64_t* head_start, int64_t* head_end,
                    int64_t* seq_start, int32_t* seq_len,
                    int64_t* qual_start, int32_t* flags_out) {
    int64_t pos = 0;
    int32_t has_cr = 0;
    for (int64_t r = 0; r < n_records; ++r) {
        int64_t ls[4], le[4];
        for (int line = 0; line < 4; ++line) {
            ls[line] = pos;
            const uint8_t* nlp =
                (const uint8_t*)memchr(buf + pos, '\n', n - pos);
            int64_t lend = nlp ? (int64_t)(nlp - buf) : n;
            int64_t e = lend;
            if (e > ls[line] && buf[e - 1] == '\r') {
                --e;
                has_cr = 1;
            }
            le[line] = e;
            pos = lend + 1;
        }
        head_start[r] = ls[0] + 1;  // skip '@'
        head_end[r] = le[0];
        seq_start[r] = ls[1];
        seq_len[r] = (int32_t)(le[1] - ls[1]);
        qual_start[r] = ls[3];
        if (le[3] - ls[3] != le[1] - ls[1]) return -2;
    }
    *flags_out = has_cr;
    return n_records;
}

// --- k-mer prefilter (concatenated shift-and) -------------------------------
//
// Same predicate as KmerFinder.kmers_present, evaluated per record
// over the raw chunk buffer.  `stops` uses 0 to mean "to the end of
// the sequence".  Writes 1 into out_mask[r] iff record r needs the DP.

// `reverse` scans each sequence back-to-front (for rightmost adapter
// variants, whose k-mer sets are built against the reversed read).
void kmer_prefilter(const uint8_t* buf, const int64_t* seq_start,
                    const int32_t* seq_len, int64_t n_records,
                    int64_t n_entries, const int64_t* starts,
                    const int64_t* stops, const uint64_t* init_masks,
                    const uint64_t* found_masks, const uint64_t* masks,
                    int32_t reverse, uint8_t* out_mask) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* seq = buf + seq_start[r];
        const int64_t len = seq_len[r];
        uint8_t hit = 0;
        for (int64_t e = 0; e < n_entries && !hit; ++e) {
            int64_t start = starts[e];
            int64_t stop = stops[e];
            if (start < 0) {
                start += len;
                if (start < 0) start = 0;
            } else if (start > len) {
                continue;
            }
            if (stop < 0) {
                stop += len;
                if (stop <= 0) continue;
            } else if (stop == 0) {
                stop = len;
            }
            if (stop > len) stop = len;
            if (stop - start <= 0) continue;
            const uint64_t init = init_masks[e];
            const uint64_t found = found_masks[e];
            const uint64_t* mask = masks + e * 128;
            uint64_t rreg = 0;
            for (int64_t i = start; i < stop; ++i) {
                const uint8_t c = reverse ? seq[len - 1 - i] : seq[i];
                rreg = ((rreg << 1) | init) & (c < 128 ? mask[c] : 0);
                if (rreg & found) {
                    hit = 1;
                    break;
                }
            }
        }
        out_mask[r] = hit;
    }
}

// --- candidate gather + encode ---------------------------------------------
//
// Gathers selected reads into a padded (n_sel, width) matrix,
// translating each byte through a 256-entry LUT; pad positions are 0.

// `reverse` emits each selected read back-to-front.
void pad_encode(const uint8_t* buf, const int64_t* seq_start,
                const int32_t* seq_len, const int64_t* sel, int64_t n_sel,
                int64_t width, const uint8_t* lut, int32_t reverse,
                uint8_t* out) {
    for (int64_t i = 0; i < n_sel; ++i) {
        const int64_t r = sel[i];
        const int64_t full = seq_len[r];
        const uint8_t* src = buf + seq_start[r];
        int64_t len = full;
        if (len > width) len = width;
        uint8_t* dst = out + i * width;
        if (reverse) {
            for (int64_t t = 0; t < len; ++t)
                dst[t] = lut[src[full - 1 - t]];
        } else {
            for (int64_t t = 0; t < len; ++t) dst[t] = lut[src[t]];
        }
        if (len < width) memset(dst + len, 0, width - len);
    }
}

// Same, but packs two 4-bit codes per output byte (lo nibble first):
// out byte t holds code[2t] | code[2t+1] << 4.  width must be even;
// out is (n_sel, width/2).  LUT values must be < 16.

void pad_encode_pack4(const uint8_t* buf, const int64_t* seq_start,
                      const int32_t* seq_len, const int64_t* sel,
                      int64_t n_sel, int64_t width, const uint8_t* lut,
                      int32_t reverse, uint8_t* out) {
    const int64_t wp = width / 2;
    for (int64_t i = 0; i < n_sel; ++i) {
        const int64_t r = sel[i];
        const int64_t n = seq_len[r];
        const uint8_t* src = buf + seq_start[r];
        int64_t len = n;
        if (len > width) len = width;
        uint8_t* dst = out + i * wp;
        int64_t pairs = len / 2;
        if (reverse) {
            for (int64_t t = 0; t < pairs; ++t)
                dst[t] = (uint8_t)(lut[src[n - 1 - 2 * t]] |
                                   (lut[src[n - 2 - 2 * t]] << 4));
            if (len & 1) dst[pairs] = lut[src[n - len]];
        } else {
            for (int64_t t = 0; t < pairs; ++t)
                dst[t] = (uint8_t)(lut[src[2 * t]] |
                                   (lut[src[2 * t + 1]] << 4));
            if (len & 1) dst[pairs] = lut[src[len - 1]];
        }
        int64_t used = (len + 1) / 2;
        if (used < wp) memset(dst + used, 0, wp - used);
    }
}

// --- trimmed FASTQ assembly --------------------------------------------------
//
// Emits '@head\nseq[:stop]\n+\nqual[:stop]\n' per record.  The caller
// computes the exact output size (sum of 6 + head_len + 2*stop) and
// provides the buffer.  Returns bytes written.

int64_t assemble_fastq(const uint8_t* buf, int64_t n_records,
                       const int64_t* head_start, const int64_t* head_end,
                       const int64_t* seq_start, const int64_t* qual_start,
                       const int64_t* stops, uint8_t* out) {
    uint8_t* dst = out;
    for (int64_t r = 0; r < n_records; ++r) {
        *dst++ = '@';
        const int64_t hl = head_end[r] - head_start[r];
        memcpy(dst, buf + head_start[r], hl);
        dst += hl;
        *dst++ = '\n';
        const int64_t stop = stops[r];
        memcpy(dst, buf + seq_start[r], stop);
        dst += stop;
        *dst++ = '\n';
        *dst++ = '+';
        *dst++ = '\n';
        memcpy(dst, buf + qual_start[r], stop);
        dst += stop;
        *dst++ = '\n';
    }
    return (int64_t)(dst - out);
}

// --- paired-read name check ---------------------------------------------------
//
// Read IDs (header up to the first ASCII whitespace) must match,
// ignoring a trailing '1'/'2'/'3' (mate-number conventions) — same
// predicate as record_names_match (cutadapt_tpu/io/records.py).
// Returns -1 when every pair matches, else the first offending index.

static inline int64_t id_len(const uint8_t* h, int64_t n) {
    int64_t i = 0;
    while (i < n) {
        const uint8_t c = h[i];
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\v' ||
            c == '\f')
            break;
        ++i;
    }
    if (i > 0) {
        const uint8_t last = h[i - 1];
        if (last == '1' || last == '2' || last == '3') --i;
    }
    return i;
}

int64_t check_pair_names(const uint8_t* buf1, const int64_t* hs1,
                         const int64_t* he1, const uint8_t* buf2,
                         const int64_t* hs2, const int64_t* he2,
                         int64_t n_records) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* h1 = buf1 + hs1[r];
        const uint8_t* h2 = buf2 + hs2[r];
        const int64_t l1 = id_len(h1, he1[r] - hs1[r]);
        const int64_t l2 = id_len(h2, he2[r] - hs2[r]);
        if (l1 != l2 || memcmp(h1, h2, l1) != 0) return r;
    }
    return -1;
}

// --- quality / poly-A trimming scans -----------------------------------------
//
// Exact reference semantics (qualtrim.pyx / cutadapt_tpu/qualtrim.py),
// evaluated per read over the current [win_start, win_stop) window of
// each record. Outputs are window-relative trim offsets applied as
// new absolute windows by the caller.

// BWA quality trim. cutoff_front < 0 disables the 5' pass,
// cutoff_back < 0 disables the 3' pass. Window collapse -> empty
// window at the original start (start == stop == 0 relative).
void quality_trim(const uint8_t* buf, const int64_t* qual_start,
                  const int32_t* win_start, const int32_t* win_stop,
                  int64_t n_records, int32_t cutoff_front,
                  int32_t cutoff_back, int32_t base, int32_t* out_start,
                  int32_t* out_stop) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* q = buf + qual_start[r] + win_start[r];
        const int64_t n = win_stop[r] - win_start[r];
        int64_t start = 0, stop = n;
        if (cutoff_front >= 0) {
            int64_t s = 0, max_qual = 0;
            for (int64_t i = 0; i < n; ++i) {
                s += cutoff_front - ((int64_t)q[i] - base);
                if (s < 0) break;
                if (s > max_qual) {
                    max_qual = s;
                    start = i + 1;
                }
            }
        }
        if (cutoff_back >= 0) {
            int64_t s = 0, max_qual = 0;
            for (int64_t i = n - 1; i >= 0; --i) {
                s += cutoff_back - ((int64_t)q[i] - base);
                if (s < 0) break;
                if (s > max_qual) {
                    max_qual = s;
                    stop = i;
                }
            }
        }
        if (start >= stop) {
            start = 0;
            stop = 0;
        }
        out_start[r] = (int32_t)start;
        out_stop[r] = (int32_t)stop;
    }
}

// NextSeq 3' trim: like the 3' pass above but G bases count as
// quality (cutoff - 1). Returns the window-relative stop.
void nextseq_trim(const uint8_t* buf, const int64_t* seq_start,
                  const int64_t* qual_start, const int32_t* win_start,
                  const int32_t* win_stop, int64_t n_records, int32_t cutoff,
                  int32_t base, int32_t* out_stop) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* sq = buf + seq_start[r] + win_start[r];
        const uint8_t* q = buf + qual_start[r] + win_start[r];
        const int64_t n = win_stop[r] - win_start[r];
        int64_t s = 0, max_qual = 0, max_i = n;
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t qv = (int64_t)q[i] - base;
            if (sq[i] == 'G') qv = cutoff - 1;
            s += cutoff - qv;
            if (s < 0) break;
            if (s > max_qual) {
                max_qual = s;
                max_i = i;
            }
        }
        out_stop[r] = (int32_t)max_i;
    }
}

// Poly-A tail (revcomp=0: 'A' tail at the 3' end, returns
// window-relative tail start) or poly-T head (revcomp=1: returns
// window-relative head end). Max error rate 0.2, min length 3.
void poly_a_trim(const uint8_t* buf, const int64_t* seq_start,
                 const int32_t* win_start, const int32_t* win_stop,
                 int64_t n_records, int32_t revcomp, int32_t* out_index) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* s = buf + seq_start[r] + win_start[r];
        const int64_t n = win_stop[r] - win_start[r];
        int64_t best_score = 0, score = 0, errors = 0, best_index;
        if (revcomp) {
            best_index = 0;
            for (int64_t i = 0; i < n; ++i) {
                if (s[i] == 'T') {
                    score += 1;
                } else {
                    score -= 2;
                    ++errors;
                }
                if (score > best_score && errors * 5 <= i + 1) {
                    best_score = score;
                    best_index = i + 1;
                }
            }
            if (best_index < 3) best_index = 0;
        } else {
            best_index = n;
            for (int64_t i = n - 1; i >= 0; --i) {
                if (s[i] == 'A') {
                    score += 1;
                } else {
                    score -= 2;
                    ++errors;
                }
                if (score > best_score && errors * 5 <= n - i) {
                    best_score = score;
                    best_index = i;
                }
            }
            if (best_index > n - 3) best_index = n;
        }
        out_index[r] = (int32_t)best_index;
    }
}

// --- filter predicate scans ----------------------------------------------------

// Expected errors per window: 4-lane summation over a caller-provided
// 94-entry phred->error-probability table (float64, exactly the host
// engine's accumulation order — qualtrim.py expected_errors /
// reference expected_errors.h:103-140). Writes -1.0 for any window
// containing an invalid phred; the caller re-runs those through the
// host path so the error message is identical.
void expected_errors_win(const uint8_t* buf, const int64_t* qual_start,
                         const int32_t* win_start, const int32_t* win_stop,
                         int64_t n_records, int32_t base,
                         const double* table, double* out) {
    const int32_t max_phred = 126 - base;
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* q = buf + qual_start[r] + win_start[r];
        const int64_t n = win_stop[r] - win_start[r];
        double e0 = 0.0, e1 = 0.0, e2 = 0.0, e3 = 0.0;
        int64_t i = 0;
        int bad = 0;
        for (; i + 4 <= n; i += 4) {
            const int32_t p0 = (int32_t)q[i] - base;
            const int32_t p1 = (int32_t)q[i + 1] - base;
            const int32_t p2 = (int32_t)q[i + 2] - base;
            const int32_t p3 = (int32_t)q[i + 3] - base;
            if (p0 < 0 || p0 > max_phred || p1 < 0 || p1 > max_phred ||
                p2 < 0 || p2 > max_phred || p3 < 0 || p3 > max_phred) {
                bad = 1;
                break;
            }
            e0 += table[p0];
            e1 += table[p1];
            e2 += table[p2];
            e3 += table[p3];
        }
        if (!bad) {
            for (; i < n; ++i) {
                const int32_t p = (int32_t)q[i] - base;
                if (p < 0 || p > max_phred) {
                    bad = 1;
                    break;
                }
                e0 += table[p];
            }
        }
        out[r] = bad ? -1.0 : (e0 + e1 + e2 + e3);
    }
}

// Number of 'N'/'n' bases per window.
void count_n(const uint8_t* buf, const int64_t* seq_start,
             const int32_t* win_start, const int32_t* win_stop,
             int64_t n_records, int32_t* out) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* s = buf + seq_start[r] + win_start[r];
        const int64_t n = win_stop[r] - win_start[r];
        int32_t c = 0;
        for (int64_t i = 0; i < n; ++i)
            c += (s[i] == 'N' || s[i] == 'n');
        out[r] = c;
    }
}

// CASAVA filter flag: header 'xxxx x:Y:x:x' — the three bytes after
// the first character following the first space must be ':Y:'.
void casava_filtered(const uint8_t* buf, const int64_t* head_start,
                     const int64_t* head_end, int64_t n_records,
                     uint8_t* out) {
    for (int64_t r = 0; r < n_records; ++r) {
        const uint8_t* h = buf + head_start[r];
        const int64_t n = head_end[r] - head_start[r];
        const uint8_t* sp = (const uint8_t*)memchr(h, ' ', n);
        uint8_t flag = 0;
        if (sp != nullptr) {
            const int64_t rest = n - (sp - h) - 1;  // after the space
            if (rest >= 4)
                flag = sp[2] == ':' && sp[3] == 'Y' && sp[4] == ':';
        }
        out[r] = flag;
    }
}

// --- windowed trimmed-FASTQ assembly with keep mask --------------------------
//
// Emits '@head\nseq[start:stop]\n+\nqual[start:stop]\n' for records
// with keep[r] != 0. Caller precomputes the exact output size.

int64_t assemble_fastq_window(const uint8_t* buf, int64_t n_records,
                              const int64_t* head_start,
                              const int64_t* head_end,
                              const int64_t* seq_start,
                              const int64_t* qual_start,
                              const int32_t* win_start,
                              const int32_t* win_stop, const uint8_t* keep,
                              uint8_t* out) {
    uint8_t* dst = out;
    for (int64_t r = 0; r < n_records; ++r) {
        if (!keep[r]) continue;
        *dst++ = '@';
        const int64_t hl = head_end[r] - head_start[r];
        memcpy(dst, buf + head_start[r], hl);
        dst += hl;
        *dst++ = '\n';
        const int64_t len = win_stop[r] - win_start[r];
        memcpy(dst, buf + seq_start[r] + win_start[r], len);
        dst += len;
        *dst++ = '\n';
        *dst++ = '+';
        *dst++ = '\n';
        memcpy(dst, buf + qual_start[r] + win_start[r], len);
        dst += len;
        *dst++ = '\n';
    }
    return (int64_t)(dst - out);
}

}  // extern "C"
