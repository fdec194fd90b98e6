// dy4tpu native host runtime: lock-free streaming I/O for the receiver.
//
// TPU-native replacement for the reference's host plumbing: the
// mutex+condvar threadSafeQ (src/threadSafeQ.cpp:18-55) becomes a
// cache-line-aligned single-producer/single-consumer ring buffer, and the
// blocking stdin/stdout loops (src/iofunc.cpp:113-120, project.cpp:313-317)
// become dedicated reader/writer threads so the Python/JAX dispatch loop
// never stalls on a pipe.  Exposed as a C ABI for ctypes (no pybind11 in
// this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <chrono>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

#include <unistd.h>

namespace {

// ---------------------------------------------------------------------------
// SPSC byte ring buffer.  Capacity rounded up to a power of two; indices are
// monotonically increasing 64-bit counters so full/empty never ambiguity.
// ---------------------------------------------------------------------------
class RingBuffer {
 public:
  explicit RingBuffer(size_t capacity) {
    size_t cap = 1;
    while (cap < capacity) cap <<= 1;
    buf_.resize(cap);
    mask_ = cap - 1;
  }

  size_t capacity() const { return buf_.size(); }
  size_t readable() const {
    return head_.load(std::memory_order_acquire) -
           tail_.load(std::memory_order_acquire);
  }
  size_t writable() const { return capacity() - readable(); }

  // Producer side. Returns bytes accepted (may be < n if full).
  size_t push(const uint8_t* data, size_t n) {
    const uint64_t head = head_.load(std::memory_order_relaxed);
    const uint64_t tail = tail_.load(std::memory_order_acquire);
    size_t space = capacity() - static_cast<size_t>(head - tail);
    size_t take = n < space ? n : space;
    for (size_t i = 0; i < take; ++i)
      buf_[(head + i) & mask_] = data[i];
    head_.store(head + take, std::memory_order_release);
    if (take) {
      std::lock_guard<std::mutex> g(m_);
      cv_.notify_all();
    }
    return take;
  }

  // Consumer side. Returns bytes copied (may be < n if empty).
  size_t pop(uint8_t* dst, size_t n) {
    const uint64_t tail = tail_.load(std::memory_order_relaxed);
    const uint64_t head = head_.load(std::memory_order_acquire);
    size_t avail = static_cast<size_t>(head - tail);
    size_t take = n < avail ? n : avail;
    for (size_t i = 0; i < take; ++i)
      dst[i] = buf_[(tail + i) & mask_];
    tail_.store(tail + take, std::memory_order_release);
    if (take) {
      std::lock_guard<std::mutex> g(m_);
      cv_.notify_all();
    }
    return take;
  }

  // Block until at least n bytes readable, EOF flagged, or timeout.
  // Returns readable() at wake-up.
  size_t wait_readable(size_t n, long timeout_ms) {
    std::unique_lock<std::mutex> lk(m_);
    auto pred = [&] { return readable() >= n || eof_.load(); };
    if (timeout_ms < 0) {
      cv_.wait(lk, pred);
    } else {
      cv_.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred);
    }
    return readable();
  }

  size_t wait_writable(size_t n, long timeout_ms) {
    std::unique_lock<std::mutex> lk(m_);
    auto pred = [&] { return writable() >= n || closed_.load(); };
    if (timeout_ms < 0) {
      cv_.wait(lk, pred);
    } else {
      cv_.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred);
    }
    return writable();
  }

  void set_eof() {
    eof_.store(true);
    std::lock_guard<std::mutex> g(m_);
    cv_.notify_all();
  }
  bool eof() const { return eof_.load(); }
  void close() {
    closed_.store(true);
    std::lock_guard<std::mutex> g(m_);
    cv_.notify_all();
  }
  bool closed() const { return closed_.load(); }

 private:
  std::vector<uint8_t> buf_;
  size_t mask_ = 0;
  alignas(64) std::atomic<uint64_t> head_{0};  // produced
  alignas(64) std::atomic<uint64_t> tail_{0};  // consumed
  std::atomic<bool> eof_{false};
  std::atomic<bool> closed_{false};
  std::mutex m_;               // only for blocking waits, not the fast path
  std::condition_variable cv_;
};

// ---------------------------------------------------------------------------
// Source: fd reader thread -> ring -> fixed-size blocks for the device loop.
// ---------------------------------------------------------------------------
struct Source {
  Source(int fd, size_t block_bytes, size_t capacity_blocks)
      : fd(fd), block(block_bytes),
        ring(block_bytes * (capacity_blocks < 2 ? 2 : capacity_blocks)),
        th([this] { run(); }) {}

  ~Source() {
    stop.store(true);
    ring.close();
    if (th.joinable()) th.join();
  }

  void run() {
    std::vector<uint8_t> tmp(1 << 16);
    while (!stop.load()) {
      size_t space = ring.wait_writable(tmp.size(), 100);
      if (ring.closed() || stop.load()) break;
      if (space == 0) continue;
      size_t want = space < tmp.size() ? space : tmp.size();
      ssize_t got = ::read(fd, tmp.data(), want);
      if (got <= 0) {  // EOF or error: reference exits on short read
        ring.set_eof();
        break;
      }
      size_t off = 0;
      while (off < static_cast<size_t>(got) && !stop.load())
        off += ring.push(tmp.data() + off, got - off);
    }
    ring.set_eof();
  }

  // 1 = block copied, 0 = EOF (no full block left), -1 = timeout.
  int next(uint8_t* dst, long timeout_ms) {
    for (;;) {
      size_t avail = ring.wait_readable(block, timeout_ms);
      if (avail >= block) {
        size_t off = 0;
        while (off < block) off += ring.pop(dst + off, block - off);
        return 1;
      }
      if (ring.eof()) return 0;
      if (timeout_ms >= 0) return -1;
    }
  }

  int fd;
  size_t block;
  RingBuffer ring;
  std::atomic<bool> stop{false};
  std::thread th;
};

// ---------------------------------------------------------------------------
// Sink: blocks -> ring -> fd writer thread.
// ---------------------------------------------------------------------------
struct Sink {
  Sink(int fd, size_t capacity_bytes)
      : fd(fd), ring(capacity_bytes), th([this] { run(); }) {}

  ~Sink() {
    ring.set_eof();           // no more producer data
    if (th.joinable()) th.join();
  }

  void run() {
    std::vector<uint8_t> tmp(1 << 16);
    for (;;) {
      size_t avail = ring.wait_readable(1, 100);
      if (avail == 0) {
        if (ring.eof()) break;
        continue;
      }
      size_t got = ring.pop(tmp.data(), tmp.size());
      size_t off = 0;
      while (off < got) {
        ssize_t w = ::write(fd, tmp.data() + off, got - off);
        if (w <= 0) { error.store(true); return; }
        off += static_cast<size_t>(w);
      }
    }
  }

  // 1 = accepted, -1 = timeout/overflow, -2 = downstream write error.
  int push(const uint8_t* data, size_t n, long timeout_ms) {
    if (error.load()) return -2;
    size_t off = 0;
    while (off < n) {
      ring.wait_writable(1, timeout_ms);
      size_t pushed = ring.push(data + off, n - off);
      if (pushed == 0 && timeout_ms >= 0) return -1;
      if (error.load()) return -2;
      off += pushed;
    }
    return 1;
  }

  int flush(long timeout_ms) {
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::milliseconds(timeout_ms < 0 ? 3600000
                                                             : timeout_ms);
    while (ring.readable() > 0 && !error.load()) {
      if (std::chrono::steady_clock::now() > deadline) return -1;
      std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    return error.load() ? -2 : 1;
  }

  int fd;
  RingBuffer ring;
  std::atomic<bool> error{false};
  std::thread th;
};

}  // namespace

extern "C" {

// ---- bare ring (threadSafeQ parity object, used by tests) ----
void* dy4_ring_create(size_t capacity) { return new RingBuffer(capacity); }
void dy4_ring_destroy(void* r) { delete static_cast<RingBuffer*>(r); }
size_t dy4_ring_push(void* r, const uint8_t* d, size_t n) {
  return static_cast<RingBuffer*>(r)->push(d, n);
}
size_t dy4_ring_pop(void* r, uint8_t* d, size_t n) {
  return static_cast<RingBuffer*>(r)->pop(d, n);
}
size_t dy4_ring_readable(void* r) {
  return static_cast<RingBuffer*>(r)->readable();
}
size_t dy4_ring_wait_readable(void* r, size_t n, long timeout_ms) {
  return static_cast<RingBuffer*>(r)->wait_readable(n, timeout_ms);
}
void dy4_ring_set_eof(void* r) { static_cast<RingBuffer*>(r)->set_eof(); }

// ---- source ----
void* dy4_source_create(int fd, size_t block_bytes, size_t capacity_blocks) {
  return new Source(fd, block_bytes, capacity_blocks);
}
int dy4_source_next(void* s, uint8_t* dst, long timeout_ms) {
  return static_cast<Source*>(s)->next(dst, timeout_ms);
}
size_t dy4_source_buffered(void* s) {
  return static_cast<Source*>(s)->ring.readable();
}
void dy4_source_destroy(void* s) { delete static_cast<Source*>(s); }

// ---- sink ----
void* dy4_sink_create(int fd, size_t capacity_bytes) {
  return new Sink(fd, capacity_bytes);
}
int dy4_sink_push(void* s, const uint8_t* data, size_t n, long timeout_ms) {
  return static_cast<Sink*>(s)->push(data, n, timeout_ms);
}
int dy4_sink_flush(void* s, long timeout_ms) {
  return static_cast<Sink*>(s)->flush(timeout_ms);
}
void dy4_sink_destroy(void* s) { delete static_cast<Sink*>(s); }

}  // extern "C"
