// Fast host-side tokenization for the data pipeline.
//
// The reference tokenizes with Python regex / HF map calls
// (/root/reference/tokenizer.py:129-131, dataloader.py:345-420), which
// dominates dataset build time for large corpora (QM9: 130K molecules,
// ZINC250k: 250K). This library provides:
//   * greedy longest-match tokenization over an arbitrary token
//     inventory (correct for the SMILES vocabularies, whose multi-char
//     tokens are bracket atoms and two-letter elements), and
//   * batch char-LUT tokenization for character vocabularies
//     (text8 / DNA).
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// A byte-trie over the token inventory for greedy longest-match.
struct TrieNode {
  int32_t token_id = -1;            // id if a token ends here
  int32_t children[256];
  TrieNode() { memset(children, -1, sizeof(children)); }
};

struct Trie {
  std::vector<TrieNode> nodes;
  Trie() { nodes.emplace_back(); }

  void insert(const char* tok, int32_t len, int32_t id) {
    int cur = 0;
    for (int32_t i = 0; i < len; ++i) {
      unsigned char c = static_cast<unsigned char>(tok[i]);
      if (nodes[cur].children[c] < 0) {
        nodes[cur].children[c] = static_cast<int32_t>(nodes.size());
        nodes.emplace_back();
      }
      cur = nodes[cur].children[c];
    }
    nodes[cur].token_id = id;
  }
};

}  // namespace

extern "C" {

// Build a tokenizer from a NUL-separated token inventory.
// tokens: concatenated token strings separated by '\0', count entries.
// ids are assigned 0..count-1 in order. Returns an opaque handle.
void* ddg_trie_new(const char* tokens, const int32_t* lengths,
                   int32_t count) {
  Trie* trie = new Trie();
  const char* p = tokens;
  for (int32_t i = 0; i < count; ++i) {
    trie->insert(p, lengths[i], i);
    p += lengths[i];
  }
  return trie;
}

void ddg_trie_free(void* handle) { delete static_cast<Trie*>(handle); }

// Greedy longest-match tokenize `text` (len bytes) into out (cap ids).
// Unknown bytes emit unk_id and advance one byte. Returns #ids.
int32_t ddg_trie_tokenize(void* handle, const char* text, int32_t len,
                          int32_t unk_id, int32_t* out, int32_t cap) {
  const Trie& trie = *static_cast<Trie*>(handle);
  int32_t n = 0;
  int32_t i = 0;
  while (i < len && n < cap) {
    int cur = 0;
    int32_t best_id = -1;
    int32_t best_len = 0;
    for (int32_t j = i; j < len; ++j) {
      unsigned char c = static_cast<unsigned char>(text[j]);
      int nxt = trie.nodes[cur].children[c];
      if (nxt < 0) break;
      cur = nxt;
      if (trie.nodes[cur].token_id >= 0) {
        best_id = trie.nodes[cur].token_id;
        best_len = j - i + 1;
      }
    }
    if (best_id >= 0) {
      out[n++] = best_id;
      i += best_len;
    } else {
      out[n++] = unk_id;
      i += 1;
    }
  }
  return n;
}

// Batch tokenize: texts = concatenated strings, offsets has count+1
// entries. Output is padded/truncated to block_size with pad_id; mask
// gets 1.0 where real tokens. bos/eos == kDisabled to disable (ids may
// legitimately be negative after the caller's offset shift).
void ddg_trie_tokenize_batch(void* handle, const char* texts,
                             const int64_t* offsets, int32_t count,
                             int32_t unk_id, int32_t bos_id,
                             int32_t eos_id, int32_t pad_id,
                             int32_t block_size, int32_t* out_ids,
                             float* out_mask) {
  const int32_t kDisabled = -1000000;
  std::vector<int32_t> buf(block_size + 2);
  for (int32_t r = 0; r < count; ++r) {
    const char* text = texts + offsets[r];
    int32_t len = static_cast<int32_t>(offsets[r + 1] - offsets[r]);
    int32_t n = 0;
    if (bos_id != kDisabled) buf[n++] = bos_id;
    n += ddg_trie_tokenize(handle, text, len, unk_id, buf.data() + n,
                           block_size - n);
    if (eos_id != kDisabled && n < block_size) buf[n++] = eos_id;
    int32_t* row = out_ids + static_cast<int64_t>(r) * block_size;
    float* mrow = out_mask + static_cast<int64_t>(r) * block_size;
    for (int32_t j = 0; j < block_size; ++j) {
      row[j] = j < n ? buf[j] : pad_id;
      mrow[j] = j < n ? 1.0f : 0.0f;
    }
  }
}

// SMILES lexing with regex parity (reference tokenizer.py:106-111,
// pattern from github.com/pschwllr/MolecularTransformer):
//   \[[^\]]+]  |  Br? | Cl?  |  single chars NOSPFIbcnosp()=.#-+\/:~@?>*$  |
//   %[0-9]{2}  |  [0-9]
// Characters that match no alternative are DROPPED (re.findall
// semantics), not mapped to unk; tokens absent from the vocabulary map
// to unk_id. The trie is used for exact vocab lookup only.

static int32_t lookup_exact(const Trie& trie, const char* tok,
                            int32_t len) {
  int cur = 0;
  for (int32_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(tok[i]);
    int nxt = trie.nodes[cur].children[c];
    if (nxt < 0) return -1;
    cur = nxt;
  }
  return trie.nodes[cur].token_id;
}

static bool is_single(char c) {
  switch (c) {
    case 'N': case 'O': case 'S': case 'P': case 'F': case 'I':
    case 'B': case 'C':
    case 'b': case 'c': case 'n': case 'o': case 's': case 'p':
    case '(': case ')': case '.': case '=': case '#': case '-':
    case '+': case '\\': case '/': case ':': case '~': case '@':
    case '?': case '>': case '*': case '$':
      return true;
    default:
      return c >= '0' && c <= '9';
  }
}

int32_t ddg_smiles_tokenize(void* handle, const char* text, int32_t len,
                            int32_t unk_id, int32_t* out, int32_t cap) {
  const Trie& trie = *static_cast<Trie*>(handle);
  int32_t n = 0;
  int32_t i = 0;
  while (i < len && n < cap) {
    int32_t tok_len = 0;
    if (text[i] == '[') {
      int32_t j = i + 1;
      while (j < len && text[j] != ']') ++j;
      if (j < len && j > i + 1) tok_len = j - i + 1;
    } else if (text[i] == '%' && i + 2 < len + 1 && i + 2 < len &&
               text[i + 1] >= '0' && text[i + 1] <= '9' &&
               text[i + 2] >= '0' && text[i + 2] <= '9') {
      tok_len = 3;
    } else if (text[i] == 'B' && i + 1 < len && text[i + 1] == 'r') {
      tok_len = 2;
    } else if (text[i] == 'C' && i + 1 < len && text[i + 1] == 'l') {
      tok_len = 2;
    } else if (is_single(text[i])) {
      tok_len = 1;
    }
    if (tok_len == 0) {
      ++i;  // dropped by the regex
      continue;
    }
    int32_t id = lookup_exact(trie, text + i, tok_len);
    out[n++] = id >= 0 ? id : unk_id;
    i += tok_len;
  }
  return n;
}

// Like ddg_trie_tokenize_batch but with SMILES lexing.
void ddg_smiles_tokenize_batch(void* handle, const char* texts,
                               const int64_t* offsets, int32_t count,
                               int32_t unk_id, int32_t bos_id,
                               int32_t eos_id, int32_t pad_id,
                               int32_t block_size, int32_t* out_ids,
                               float* out_mask) {
  const int32_t kDisabled = -1000000;
  std::vector<int32_t> buf(block_size + 2);
  for (int32_t r = 0; r < count; ++r) {
    const char* text = texts + offsets[r];
    int32_t len = static_cast<int32_t>(offsets[r + 1] - offsets[r]);
    int32_t n = 0;
    if (bos_id != kDisabled) buf[n++] = bos_id;
    n += ddg_smiles_tokenize(handle, text, len, unk_id, buf.data() + n,
                             block_size - n);
    if (eos_id != kDisabled && n < block_size) buf[n++] = eos_id;
    int32_t* row = out_ids + static_cast<int64_t>(r) * block_size;
    float* mrow = out_mask + static_cast<int64_t>(r) * block_size;
    for (int32_t j = 0; j < block_size; ++j) {
      row[j] = j < n ? buf[j] : pad_id;
      mrow[j] = j < n ? 1.0f : 0.0f;
    }
  }
}

// Char-LUT tokenization: map each byte through lut (256 entries).
void ddg_lut_tokenize(const char* text, int64_t len, const int32_t* lut,
                      int32_t* out) {
  for (int64_t i = 0; i < len; ++i) {
    out[i] = lut[static_cast<unsigned char>(text[i])];
  }
}

}  // extern "C"
