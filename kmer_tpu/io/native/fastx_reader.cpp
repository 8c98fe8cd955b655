// Native FASTA/FASTQ block reader for kmer_tpu.
//
// Fills fixed-capacity byte buffers with NUL-separated read sequences,
// ready for device upload — the host side of the counting pipeline
// (the role kseq.h + the kt_pipeline read step play in the reference:
// /root/reference/kc-c4.c:133-155).  Fresh implementation: a chunked
// gzread scanner with a small record state machine; sequences shorter
// than k are skipped, sequences longer than the buffer are split into
// (k-1)-overlap chunks so no k-mer window is lost or duplicated.
//
// C ABI for ctypes.

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr size_t kChunk = 1 << 20;

struct Reader {
  gzFile fp = nullptr;
  std::string buf;        // unconsumed raw bytes
  size_t pos = 0;         // cursor into buf
  bool eof = false;
  std::vector<uint8_t> scratch;  // ASCII staging for the packed path

  // carry-over sequence that did not fit the caller's buffer
  std::string carry;
  size_t carry_off = 0;

  bool stopped = false;  // kseq -2 (malformed quality): latch EOF

  // malformed-quality policy (see kmer_tpu/io/fastx.py FastxReader):
  // stop (kc-c1/c2-style) vs flush-and-resume with empty-virtual-block
  // stop (kc-c3/c4/yak/vaf pipelines)
  bool qual_resume = false;
  int64_t ref_block = 0;    // the reference tool's block/chunk bases
  int64_t sum_min_len = 0;  // reads shorter than this skip the sum
  int64_t ref_sum = 0;
  int64_t workers = 0;      // kt_pipeline workers: NULL budget
  int64_t nulls = 0;

  bool fill() {
    if (eof) return false;
    char tmp[kChunk];
    int n = gzread(fp, tmp, kChunk);
    if (n <= 0) {
      eof = true;
      return false;
    }
    if (pos > 0) {
      buf.erase(0, pos);
      pos = 0;
    }
    buf.append(tmp, n);
    return true;
  }

  // next line (without newline); returns false at EOF with no data
  bool getline(std::string* out) {
    out->clear();
    for (;;) {
      size_t nl = buf.find('\n', pos);
      if (nl != std::string::npos) {
        size_t len = nl - pos;
        if (len && buf[nl - 1] == '\r') --len;
        out->assign(buf, pos, len);
        pos = nl + 1;
        return true;
      }
      if (!fill()) {
        if (pos < buf.size()) {
          out->assign(buf, pos, buf.size() - pos);
          if (!out->empty() && out->back() == '\r') out->pop_back();
          pos = buf.size();
          return !out->empty();
        }
        return false;
      }
    }
  }

  bool peek_char(char* c) {
    while (pos >= buf.size()) {
      if (!fill()) return false;
    }
    *c = buf[pos];
    return true;
  }

  // read the next record's sequence into *seq; false at EOF
  bool next_seq(std::string* seq) {
    while (!stopped) {
      std::string line;
      char c;
      // find header
      for (;;) {
        if (!peek_char(&c)) return false;
        if (c == '>' || c == '@') break;
        if (!getline(&line)) return false;  // skip junk line
      }
      if (!getline(&line)) return false;  // header line
      seq->clear();
      bool at_eof = false;
      for (;;) {
        if (!peek_char(&c)) { at_eof = true; break; }
        if (c == '>' || c == '@' || c == '+') break;
        if (!getline(&line)) { at_eof = true; break; }
        seq->append(line);
      }
      if (!at_eof && c == '+') {
        // '+' starts the quality section regardless of the header char
        // (kseq.h:222); a length mismatch or EOF is kseq's -2: the
        // record is dropped, then the stream stops (single-loop tools)
        // or resumes unless the reference's virtual block was empty
        // (pipelined tools; see fastx.py FastxReader for the mapping)
        getline(&line);  // '+' line
        size_t need = seq->size(), got = 0;
        // kseq always attempts one quality line before the length
        // check (kseq.h:229): an empty sequence with a non-empty
        // quality line is still a -2
        if (getline(&line)) {
          got = line.size();
          while (got < need && getline(&line)) got += line.size();
        }
        if (got != need) {  // -2
          if (!qual_resume) {
            stopped = true;
            return false;
          }
          if (ref_sum == 0 && ++nulls >= workers) {
            // empty reference block: step 0 NULL retires one pipeline
            // worker (kthread.c:120); the last one ends the stream
            stopped = true;
            return false;
          }
          ref_sum = 0;
          continue;  // drop record, read the next one
        }
      }
      if (qual_resume) {
        if ((int64_t)seq->size() >= sum_min_len) ref_sum += seq->size();
        if (ref_block > 0 && ref_sum >= ref_block) ref_sum = 0;
      }
      return true;
    }
    return false;
  }
};

}  // namespace

extern "C" {

void* ktp_open(const char* path) {
  gzFile fp = gzopen(path, "r");
  if (!fp) return nullptr;
  gzbuffer(fp, 1 << 20);
  auto* r = new Reader();
  r->fp = fp;
  return r;
}

// Configure the malformed-quality policy (must precede reads).
void ktp_set_policy(void* h, int32_t qual_resume, int64_t ref_block,
                    int64_t sum_min_len, int64_t workers) {
  auto* r = static_cast<Reader*>(h);
  r->qual_resume = qual_resume != 0;
  r->ref_block = ref_block;
  r->sum_min_len = sum_min_len;
  r->workers = workers;
}

void ktp_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r) {
    gzclose(r->fp);
    delete r;
  }
}

// Fill `out` (capacity bytes) with NUL-separated sequences.
// Returns bytes used (sequences + separators), 0 at EOF.
// n_seqs/n_bases report what was packed this call; sequences shorter
// than k are skipped; sequences longer than capacity-1 are emitted in
// (k-1)-overlap chunks (possibly across calls via the carry buffer).
// row_bytes (may be null): set to L+1 when every piece packed this call
// had the same length L (uniform Illumina reads — enables the caller's
// fixed-row window slicing), else 0.
int64_t ktp_read_block(void* h, uint8_t* out, int64_t capacity, int32_t k,
                       int64_t target_bases, int64_t* n_seqs,
                       int64_t* n_bases, int64_t* row_bytes) {
  auto* r = static_cast<Reader*>(h);
  int64_t used = 0;
  *n_seqs = 0;
  *n_bases = 0;
  int64_t first_len = -1;
  bool uniform = true;
  const int64_t max_piece = capacity - 1;
  std::string seq;
  for (;;) {
    if (used >= target_bases) break;
    const std::string* src;
    size_t off;
    if (!r->carry.empty()) {
      src = &r->carry;
      off = r->carry_off;
    } else {
      if (!r->next_seq(&seq)) break;
      if ((int64_t)seq.size() < k) continue;
      src = &seq;
      off = 0;
    }
    int64_t remain = (int64_t)src->size() - (int64_t)off;
    int64_t room = capacity - used - 1;  // leave room for separator
    if (remain <= room) {
      std::memcpy(out + used, src->data() + off, remain);
      used += remain;
      out[used++] = 0;
      *n_bases += remain;
      ++*n_seqs;
      if (first_len < 0) first_len = remain;
      else if (remain != first_len) uniform = false;
      if (src == &r->carry) {
        r->carry.clear();
        r->carry_off = 0;
      }
    } else {
      // split: emit a max_piece chunk (or what fits) with k-1 overlap
      int64_t piece = room < k ? 0 : (room > max_piece ? max_piece : room);
      if (piece >= k) {
        std::memcpy(out + used, src->data() + off, piece);
        used += piece;
        out[used++] = 0;
        *n_bases += piece;
        ++*n_seqs;
        if (first_len < 0) first_len = piece;
        else if (piece != first_len) uniform = false;
        off += piece - (k - 1);
      }
      if (src != &r->carry) {
        r->carry.assign(*src);
      }
      r->carry_off = off;
      break;  // buffer full
    }
  }
  if (row_bytes) {
    *row_bytes = (uniform && *n_seqs > 0) ? first_len + 1 : 0;
  }
  return used;
}

// Packed variant of ktp_read_block for bandwidth-limited host->device
// links: emits 2-bit base codes (A/C/G/T -> 0..3, 4 per byte,
// little-endian within the byte) plus a 1-bit-per-base invalid mask
// (N / separators / anything non-ACGT, and every slot past the packed
// region).  0.375 bytes per base instead of 1 — the device unpacks
// (kmer_tpu/pipeline/counter.py _unpack_ascii) into the exact byte
// stream ktp_read_block would have produced, modulo non-ACGT letters
// all becoming NUL (their base code is 4 either way).
// `capacity` must be a multiple of 8; packed/mask must hold
// capacity/4 and capacity/8 bytes and arrive zeroed.
int64_t ktp_read_block_packed(void* h, uint8_t* packed, uint8_t* mask,
                              int64_t capacity, int32_t k,
                              int64_t target_bases, int64_t* n_seqs,
                              int64_t* n_bases, int64_t* row_bytes) {
  auto* r = static_cast<Reader*>(h);
  if ((int64_t)r->scratch.size() < capacity) r->scratch.resize(capacity);
  int64_t used = ktp_read_block(h, r->scratch.data(), capacity, k,
                                target_bases, n_seqs, n_bases, row_bytes);
  if (used <= 0) return used;
  static uint8_t nt4[256];
  static bool init = false;
  if (!init) {
    // seq_nt4_table semantics (kc-c1.c:12-29): T and U both map to 3
    memset(nt4, 4, sizeof(nt4));
    nt4['A'] = nt4['a'] = 0;
    nt4['C'] = nt4['c'] = 1;
    nt4['G'] = nt4['g'] = 2;
    nt4['T'] = nt4['t'] = 3;
    nt4['U'] = nt4['u'] = 3;
    init = true;
  }
  const uint8_t* s = r->scratch.data();
  for (int64_t i = 0; i < used; ++i) {
    uint8_t c = nt4[s[i]];
    if (c > 3)
      mask[i >> 3] |= (uint8_t)(1u << (i & 7));
    else
      packed[i >> 2] |= (uint8_t)(c << (2 * (i & 3)));
  }
  // everything past the packed region is invalid
  int64_t i = used;
  for (; i < capacity && (i & 7); ++i) mask[i >> 3] |= (uint8_t)(1u << (i & 7));
  if (i < capacity) memset(mask + (i >> 3), 0xFF, (capacity - i) >> 3);
  return used;
}

}  // extern "C"
