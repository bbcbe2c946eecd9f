// Sequence packer — native batch builder for the streaming data pipeline.
//
// The reference's Python loader tokenizes each document to max_length with
// padding+truncation (scripts/utils/dataloader.py:24-47), wasting up to half
// the batch on pad tokens. This packer concatenates variable-length token
// streams into fixed-length rows (greedy first-fit), emitting segment ids so
// attention can stay document-local, and runs at memcpy speed in C++.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Greedy first-fit packing of documents into rows.
//
//   tokens:     concatenated int32 token ids of all documents
//   doc_lens:   length of each document (n_docs entries)
//   n_docs:     number of documents
//   seq_len:    row length
//   n_rows:     number of output rows
//   pad_id:     filler token
//   eos_id:     separator appended after each document (-1 = none)
//   out_tokens: [n_rows * seq_len] int32
//   out_segments: [n_rows * seq_len] int32 — 1-based document index within
//                 the row, 0 for padding (drives block-diagonal attention)
//   out_positions: [n_rows * seq_len] int32 — position within each document
//
// Returns the number of documents consumed (callers feed the remainder into
// the next call).
int64_t pack_sequences(const int32_t* tokens, const int64_t* doc_lens,
                       int64_t n_docs, int64_t seq_len, int64_t n_rows,
                       int32_t pad_id, int32_t eos_id, int32_t* out_tokens,
                       int32_t* out_segments, int32_t* out_positions) {
  // Fill defaults.
  for (int64_t i = 0; i < n_rows * seq_len; ++i) {
    out_tokens[i] = pad_id;
    out_segments[i] = 0;
    out_positions[i] = 0;
  }

  std::vector<int64_t> row_fill(n_rows, 0);
  std::vector<int32_t> row_seg(n_rows, 0);

  int64_t doc_offset = 0;
  int64_t consumed = 0;
  int64_t cursor_row = 0;  // first row that might still have space

  for (int64_t d = 0; d < n_docs; ++d) {
    int64_t len = doc_lens[d];
    int64_t need = len + (eos_id >= 0 ? 1 : 0);
    if (need > seq_len) {
      need = seq_len;  // truncate over-long documents
      len = seq_len - (eos_id >= 0 ? 1 : 0);
    }

    // First-fit from cursor_row.
    int64_t row = -1;
    for (int64_t r = cursor_row; r < n_rows; ++r) {
      if (seq_len - row_fill[r] >= need) {
        row = r;
        break;
      }
    }
    if (row < 0) break;  // batch full: stop, leave remaining docs unconsumed

    int64_t base = row * seq_len + row_fill[row];
    std::memcpy(out_tokens + base, tokens + doc_offset,
                sizeof(int32_t) * static_cast<size_t>(len));
    int32_t seg = ++row_seg[row];
    for (int64_t i = 0; i < len; ++i) {
      out_segments[base + i] = seg;
      out_positions[base + i] = static_cast<int32_t>(i);
    }
    if (eos_id >= 0 && len < need + 1) {
      out_tokens[base + len] = eos_id;
      out_segments[base + len] = seg;
      out_positions[base + len] = static_cast<int32_t>(len);
    }
    row_fill[row] += need;
    while (cursor_row < n_rows && seq_len - row_fill[cursor_row] < 8) {
      ++cursor_row;  // row practically full; skip it in future scans
    }

    doc_offset += doc_lens[d];
    ++consumed;
  }
  return consumed;
}

// Pad-to-length batcher (the reference's per-document scheme,
// dataloader.py:24-47): one document per row, truncate + right-pad, emit the
// attention mask. Vectorized C++ for the hot tokenizer-consumer path.
void pad_batch(const int32_t* tokens, const int64_t* doc_lens, int64_t n_docs,
               int64_t seq_len, int32_t pad_id, int32_t* out_tokens,
               int32_t* out_mask) {
  int64_t offset = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    int64_t len = doc_lens[d] < seq_len ? doc_lens[d] : seq_len;
    int32_t* row = out_tokens + d * seq_len;
    int32_t* mrow = out_mask + d * seq_len;
    std::memcpy(row, tokens + offset, sizeof(int32_t) * static_cast<size_t>(len));
    for (int64_t i = len; i < seq_len; ++i) row[i] = pad_id;
    for (int64_t i = 0; i < len; ++i) mrow[i] = 1;
    for (int64_t i = len; i < seq_len; ++i) mrow[i] = 0;
    offset += doc_lens[d];
  }
}

}  // extern "C"
