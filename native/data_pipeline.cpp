// Native batch-assembly pipeline for the data loader.
//
// The reference feeds training from torch.utils.data.DataLoader with
// worker processes (/root/reference/dataloader.py:536-562) — the batch
// gather/collate runs in native code off the trainer's critical path.
// This library is the TPU-framework equivalent: a multi-threaded batch
// assembler that gathers dataset rows directly into caller-provided
// output buffers, entirely outside the GIL (ctypes releases the GIL
// for the blocking wait call).
//
// Split of responsibilities (deliberate):
//   * Python (ddg_tpu/data/loader.py FaultTolerantLoader) owns RNG,
//     epoch permutation, host sharding, and fault-tolerant state —
//     the checkpoint-compatible semantics live in exactly one place.
//   * C++ owns the throughput path: row gather (memcpy over arbitrary
//     dtypes) on a worker pool, overlapped with the training step.
//
// Zero-copy protocol: the consumer SUBMITS the numpy output buffers
// for future batches, then WAITS for completed ones — workers write
// straight into the buffers that will be yielded, so the consumer's
// critical-path cost is one condition-variable wait.
//
// C ABI (ctypes; no pybind11 in this image):
//   ddg_loader_new(n_cols, row_bytes[], batch_size, n_threads)
//   ddg_loader_set_columns(h, base_ptrs[])          — numpy buffers
//   ddg_loader_start_epoch(h, idx, n_idx)           — permutation
//   ddg_loader_submit(h, seq, out_ptrs[])           — queue batch seq
//   ddg_loader_wait(h, seq) -> 0 ok / -1 stopped    — block until done
//   ddg_loader_stop(h)                              — abort workers
//   ddg_loader_free(h)
//
// Build: native/build.sh (g++ -O3 -shared -fPIC -pthread).

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <set>
#include <thread>
#include <vector>

namespace {

struct Task {
  int64_t seq = -1;
  std::vector<uint8_t*> outs;  // one destination buffer per column
};

struct Loader {
  // immutable config
  int32_t n_cols = 0;
  std::vector<int64_t> row_bytes;  // bytes per example, per column
  int64_t batch_size = 0;
  int32_t n_threads = 0;

  // dataset pointers (set per run; Python keeps the arrays alive)
  std::vector<const uint8_t*> bases;

  // epoch state
  const int64_t* idx = nullptr;    // permutation (Python-owned)

  std::deque<Task> queue;
  std::set<int64_t> done;
  std::mutex mu;
  std::condition_variable cv_task;  // workers wait: task available
  std::condition_variable cv_done;  // consumer waits: seq completed
  bool stop = false;
  std::vector<std::thread> workers;

  ~Loader() { join(); }

  void join() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_task.notify_all();
    cv_done.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  void gather(const Task& t) {
    const int64_t* rows = idx + t.seq * batch_size;
    for (int32_t c = 0; c < n_cols; ++c) {
      const int64_t rb = row_bytes[c];
      uint8_t* out = t.outs[c];
      const uint8_t* base = bases[c];
      for (int64_t r = 0; r < batch_size; ++r)
        memcpy(out + r * rb, base + rows[r] * rb, rb);
    }
  }

  void worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_task.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        t = std::move(queue.front());
        queue.pop_front();
      }
      gather(t);
      {
        std::lock_guard<std::mutex> lk(mu);
        done.insert(t.seq);
      }
      cv_done.notify_all();
    }
  }

  void start_epoch(const int64_t* indices) {
    join();
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.clear();
      done.clear();
      stop = false;
      idx = indices;
    }
    for (int32_t t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { worker(); });
  }

  void submit(int64_t seq, uint8_t** outs) {
    {
      std::lock_guard<std::mutex> lk(mu);
      Task t;
      t.seq = seq;
      t.outs.assign(outs, outs + n_cols);
      queue.push_back(std::move(t));
    }
    cv_task.notify_one();
  }

  int32_t wait(int64_t seq) {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return stop || done.count(seq) > 0; });
    if (done.count(seq) == 0) return -1;  // stopped
    done.erase(seq);
    return 0;
  }
};

}  // namespace

extern "C" {

void* ddg_loader_new(int32_t n_cols, const int64_t* row_bytes,
                     int64_t batch_size, int32_t n_threads) {
  auto* L = new Loader();
  L->n_cols = n_cols;
  L->row_bytes.assign(row_bytes, row_bytes + n_cols);
  L->batch_size = batch_size;
  L->n_threads = n_threads > 0 ? n_threads : 2;
  L->bases.resize(n_cols, nullptr);
  return L;
}

void ddg_loader_set_columns(void* h, const uint8_t** bases) {
  auto* L = static_cast<Loader*>(h);
  for (int32_t c = 0; c < L->n_cols; ++c) L->bases[c] = bases[c];
}

void ddg_loader_start_epoch(void* h, const int64_t* idx,
                            int64_t n_idx) {
  (void)n_idx;  // bounds are enforced by the Python wrapper
  static_cast<Loader*>(h)->start_epoch(idx);
}

void ddg_loader_submit(void* h, int64_t seq, uint8_t** outs) {
  static_cast<Loader*>(h)->submit(seq, outs);
}

int32_t ddg_loader_wait(void* h, int64_t seq) {
  return static_cast<Loader*>(h)->wait(seq);
}

void ddg_loader_stop(void* h) { static_cast<Loader*>(h)->join(); }

void ddg_loader_free(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
