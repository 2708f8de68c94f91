// Native MPSC batch queue for the dynamic-batching serving path.
//
// Reference counterpart: the lock-free pinned-host ring buffer + atomic
// dispatch of cuvs dynamic batching
// (/root/reference/cpp/src/neighbors/detail/dynamic_batching.cuh:181-250).
// On TPU there is no pinned-memory/persistent-kernel machinery — the
// queue's job is purely host-side: many request threads push query rows;
// one dispatcher thread pops a contiguous batch (filled up to capacity or
// a timeout). The implementation is a fixed-capacity ring with a mutex +
// condvars (contention is tiny at ANN request rates; correctness and
// timeout semantics matter more than lock-freedom on the host).
//
// C ABI consumed via ctypes (cuvs_tpu/neighbors/dynamic_batching.py can
// use it as a drop-in backend; the Python queue remains the fallback).

#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

extern "C" {

struct BatchQueue {
  std::mutex mu;
  std::condition_variable not_full, not_empty;
  std::vector<float> buf;      // capacity * dim
  std::vector<int64_t> ticket; // request id per row
  size_t head = 0, tail = 0, count = 0;
  size_t capacity = 0, dim = 0;
  bool closed = false;
};

BatchQueue* cuvs_tpu_queue_create(int64_t capacity, int64_t dim) {
  auto* q = new BatchQueue;
  q->capacity = capacity;
  q->dim = dim;
  q->buf.resize(capacity * dim);
  q->ticket.resize(capacity);
  return q;
}

void cuvs_tpu_queue_destroy(BatchQueue* q) { delete q; }

void cuvs_tpu_queue_close(BatchQueue* q) {
  {
    std::lock_guard<std::mutex> g(q->mu);
    q->closed = true;
  }
  q->not_empty.notify_all();
  q->not_full.notify_all();
}

// Push n rows with the given ticket. Blocks while full. Returns rows
// pushed (0 if closed).
int64_t cuvs_tpu_queue_push(BatchQueue* q, const float* rows, int64_t n,
                            int64_t ticket) {
  std::unique_lock<std::mutex> g(q->mu);
  int64_t pushed = 0;
  for (int64_t i = 0; i < n; ++i) {
    q->not_full.wait(g, [&] { return q->count < q->capacity || q->closed; });
    if (q->closed) break;
    std::memcpy(&q->buf[q->tail * q->dim], rows + i * q->dim,
                q->dim * sizeof(float));
    q->ticket[q->tail] = ticket;
    q->tail = (q->tail + 1) % q->capacity;
    ++q->count;
    ++pushed;
  }
  g.unlock();
  q->not_empty.notify_one();
  return pushed;
}

// Pop up to max_rows rows into out/out_tickets. Waits up to timeout_us for
// the FIRST row, then collects whatever is available (dispatch timeout
// semantics of dynamic_batching.hpp). Returns rows popped; 0 on
// timeout/closed-and-empty.
int64_t cuvs_tpu_queue_pop_batch(BatchQueue* q, float* out,
                                 int64_t* out_tickets, int64_t max_rows,
                                 int64_t timeout_us) {
  std::unique_lock<std::mutex> g(q->mu);
  if (q->count == 0) {
    q->not_empty.wait_for(g, std::chrono::microseconds(timeout_us),
                          [&] { return q->count > 0 || q->closed; });
  }
  int64_t n = 0;
  while (n < max_rows && q->count > 0) {
    std::memcpy(out + n * q->dim, &q->buf[q->head * q->dim],
                q->dim * sizeof(float));
    out_tickets[n] = q->ticket[q->head];
    q->head = (q->head + 1) % q->capacity;
    --q->count;
    ++n;
  }
  g.unlock();
  if (n) q->not_full.notify_all();
  return n;
}

int64_t cuvs_tpu_queue_size(BatchQueue* q) {
  std::lock_guard<std::mutex> g(q->mu);
  return q->count;
}

}  // extern "C"
