// ThreadSanitizer stress driver for data_pipeline.cpp (no Python).
//
// The Python test suite validates batch correctness and lifecycle at
// pytest speed; this driver hammers the concurrency protocol itself —
// submit-ahead vs wait, epoch churn (start_epoch joins + respawns the
// pool), mid-flight abandonment (free with gathers in the queue), and
// a cross-thread stop() racing a blocked wait() — under TSAN, which
// proves the absence of data races rather than just their
// non-observation.
//
// Build + run (native/check_tsan.sh):
//   g++ -fsanitize=thread -O1 -std=c++17 -pthread \
//       -o /tmp/ddg_tsan stress_data_pipeline.cpp data_pipeline.cpp
//   TSAN_OPTIONS=halt_on_error=1 /tmp/ddg_tsan
#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {
void* ddg_loader_new(int32_t, const int64_t*, int64_t, int32_t);
void ddg_loader_set_columns(void*, const uint8_t**);
void ddg_loader_start_epoch(void*, const int64_t*, int64_t);
void ddg_loader_submit(void*, int64_t, uint8_t**);
int32_t ddg_loader_wait(void*, int64_t);
void ddg_loader_stop(void*);
void ddg_loader_free(void*);
}

namespace {

constexpr int64_t kRows = 4096;
constexpr int64_t kRowElems = 64;      // int32 elems per row, col 0
constexpr int64_t kBatch = 32;
constexpr int64_t kBatches = kRows / kBatch;
constexpr int kLookahead = 3;

struct Fixture {
  std::vector<int32_t> col0;           // (kRows, kRowElems)
  std::vector<float> col1;             // (kRows, 8)
  std::vector<int64_t> row_bytes{kRowElems * 4, 8 * 4};
  void* h = nullptr;

  Fixture(int n_threads) {
    col0.resize(kRows * kRowElems);
    col1.resize(kRows * 8);
    for (int64_t r = 0; r < kRows; ++r) {
      for (int64_t e = 0; e < kRowElems; ++e)
        col0[r * kRowElems + e] = int32_t(r * 1000 + e);
      for (int64_t e = 0; e < 8; ++e) col1[r * 8 + e] = float(r);
    }
    h = ddg_loader_new(2, row_bytes.data(), kBatch, n_threads);
    const uint8_t* bases[2] = {
        reinterpret_cast<const uint8_t*>(col0.data()),
        reinterpret_cast<const uint8_t*>(col1.data())};
    ddg_loader_set_columns(h, bases);
  }
  ~Fixture() { ddg_loader_free(h); }
};

struct Bufs {
  std::vector<int32_t> b0;
  std::vector<float> b1;
  Bufs() : b0(kBatch * kRowElems), b1(kBatch * 8) {}
  void ptrs(uint8_t** out) {
    out[0] = reinterpret_cast<uint8_t*>(b0.data());
    out[1] = reinterpret_cast<uint8_t*>(b1.data());
  }
};

void verify(const Bufs& b, const std::vector<int64_t>& idx,
            int64_t seq) {
  for (int64_t r = 0; r < kBatch; ++r) {
    int64_t row = idx[seq * kBatch + r];
    assert(b.b0[r * kRowElems] == int32_t(row * 1000));
    assert(b.b0[r * kRowElems + kRowElems - 1] ==
           int32_t(row * 1000 + kRowElems - 1));
    assert(b.b1[r * 8] == float(row));
  }
}

// 1. Normal epochs: submit-ahead window, verify every batch, churn
//    start_epoch (join + respawn) many times.
void epochs_test() {
  Fixture f(4);
  std::vector<int64_t> idx(kRows);
  for (int epoch = 0; epoch < 20; ++epoch) {
    std::iota(idx.begin(), idx.end(), 0);
    // deterministic pseudo-shuffle
    for (int64_t i = 0; i < kRows; ++i)
      std::swap(idx[i], idx[(i * 2654435761u + epoch) % kRows]);
    ddg_loader_start_epoch(f.h, idx.data(), kRows);
    std::vector<Bufs> ring(kLookahead + 1);
    uint8_t* outs[2];
    for (int64_t b = 0; b < std::min<int64_t>(kLookahead, kBatches);
         ++b) {
      ring[b % ring.size()].ptrs(outs);
      ddg_loader_submit(f.h, b, outs);
    }
    for (int64_t b = 0; b < kBatches; ++b) {
      if (b + kLookahead < kBatches) {
        ring[(b + kLookahead) % ring.size()].ptrs(outs);
        ddg_loader_submit(f.h, b + kLookahead, outs);
      }
      int rc = ddg_loader_wait(f.h, b);
      assert(rc == 0);
      verify(ring[b % ring.size()], idx, b);
    }
  }
  std::printf("epochs_test OK\n");
}

// 2. Abandonment: free the loader with gathers still queued/in-flight
//    (the Python __del__ path) — buffers outlive the free call here,
//    matching the wrapper's _inflight ownership.
void abandon_test() {
  std::vector<int64_t> idx(kRows);
  std::iota(idx.begin(), idx.end(), 0);
  for (int round = 0; round < 50; ++round) {
    auto* f = new Fixture(4);
    ddg_loader_start_epoch(f->h, idx.data(), kRows);
    std::vector<Bufs> bufs(8);
    uint8_t* outs[2];
    for (int64_t b = 0; b < 8; ++b) {
      bufs[b].ptrs(outs);
      ddg_loader_submit(f->h, b, outs);
    }
    if (round % 2) ddg_loader_wait(f->h, 0);  // sometimes consume one
    delete f;  // join + free while later batches may be mid-gather
  }
  std::printf("abandon_test OK\n");
}

// 3. Cross-thread stop() racing a blocked wait(): wait must return -1
//    (stopped) instead of hanging, with no race on the flag.
void stop_race_test() {
  for (int round = 0; round < 50; ++round) {
    Fixture f(2);
    std::vector<int64_t> idx(kRows);
    std::iota(idx.begin(), idx.end(), 0);
    ddg_loader_start_epoch(f.h, idx.data(), kRows);
    // wait for a batch that was never submitted -> blocks until stop
    std::thread stopper([&] { ddg_loader_stop(f.h); });
    int rc = ddg_loader_wait(f.h, /*seq=*/kBatches + 7);
    assert(rc == -1);
    stopper.join();
  }
  std::printf("stop_race_test OK\n");
}

}  // namespace

int main() {
  epochs_test();
  abandon_test();
  stop_race_test();
  std::printf("ALL STRESS TESTS PASSED\n");
  return 0;
}
