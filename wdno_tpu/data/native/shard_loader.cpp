// Native shard loader: mmap'd .npy payload + worker-thread prefetch ring.
//
// Replaces the reference's torch DataLoader worker processes and its
// per-item `torch.load` inside the training hot loop (reference
// smoke/ddpm/data_2d.py:157, SURVEY §3.3) with a zero-copy design:
// the shard is mmap'd once, worker threads gather random batches into a
// ring of pinned host buffers ahead of the consumer, and the consumer
// memcpy's a ready batch out under no lock contention.
//
// Exposed as a tiny C ABI consumed from Python via ctypes (no pybind11).
//
// Determinism: batch k is always drawn with an RNG keyed on (seed, k),
// regardless of which worker fills it, so a run is reproducible for a
// fixed seed and independent of thread scheduling.

#include <atomic>
#include <condition_variable>
#include <deque>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// splitmix64: tiny, high-quality 64-bit mixer for index sampling.
inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ull);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  return z ^ (z >> 31);
}

struct Slot {
  std::vector<uint8_t> buf;
  std::atomic<int64_t> ready_ticket{-1};  // which batch index this slot holds
};

struct Loader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  uint64_t payload_off = 0;
  uint64_t n_items = 0;
  uint64_t item_bytes = 0;
  uint64_t batch = 0;
  uint64_t seed = 0;

  std::deque<Slot> slots;  // deque: Slot holds an atomic (non-movable)
  std::atomic<uint64_t> fill_ticket{0};   // next batch index to be produced
  uint64_t read_ticket = 0;               // next batch index to be consumed
  std::atomic<uint64_t> consumed{0};
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for a ready slot
  std::condition_variable cv_free;   // producers wait for a freed slot
  std::vector<std::thread> workers;

  void fill(uint64_t ticket) {
    Slot& s = slots[ticket % slots.size()];
    uint64_t rs = seed * 0x9e3779b97f4a7c15ull + ticket + 1;
    uint8_t* dst = s.buf.data();
    const uint8_t* src0 = map + payload_off;
    for (uint64_t i = 0; i < batch; ++i) {
      uint64_t idx = splitmix64(rs) % n_items;
      std::memcpy(dst + i * item_bytes, src0 + idx * item_bytes, item_bytes);
    }
    // Publish under the mutex: storing + notifying unlocked can race a
    // consumer that has evaluated its wait predicate as false but not yet
    // blocked — the notify is lost and wdno_shard_next sleeps forever.
    {
      std::lock_guard<std::mutex> lk(mu);
      s.ready_ticket.store((int64_t)ticket, std::memory_order_release);
    }
    cv_ready.notify_all();
  }

  void worker() {
    const uint64_t ring = slots.size();
    while (!stop.load(std::memory_order_relaxed)) {
      uint64_t t = fill_ticket.fetch_add(1, std::memory_order_relaxed);
      // Wait until the slot for ticket t has been consumed (t - consumed < ring).
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stop.load(std::memory_order_relaxed) ||
                 t < consumed.load(std::memory_order_acquire) + ring;
        });
      }
      if (stop.load(std::memory_order_relaxed)) return;
      fill(t);
    }
  }
};

}  // namespace

extern "C" {

void* wdno_shard_open(const char* path, uint64_t payload_off, uint64_t n_items,
                      uint64_t item_bytes, uint64_t batch, uint64_t seed,
                      int n_threads, int ring_slots) {
  if (n_items == 0 || item_bytes == 0 || batch == 0) return nullptr;
  auto* ld = new Loader();
  ld->fd = open(path, O_RDONLY);
  if (ld->fd < 0) { delete ld; return nullptr; }
  struct stat st;
  if (fstat(ld->fd, &st) != 0 ||
      (uint64_t)st.st_size < payload_off + n_items * item_bytes) {
    close(ld->fd); delete ld; return nullptr;
  }
  ld->map_len = (size_t)st.st_size;
  void* m = mmap(nullptr, ld->map_len, PROT_READ, MAP_PRIVATE, ld->fd, 0);
  if (m == MAP_FAILED) { close(ld->fd); delete ld; return nullptr; }
  madvise(m, ld->map_len, MADV_RANDOM);
  ld->map = (const uint8_t*)m;
  ld->payload_off = payload_off;
  ld->n_items = n_items;
  ld->item_bytes = item_bytes;
  ld->batch = batch;
  ld->seed = seed;
  if (ring_slots < 2) ring_slots = 2;
  if (n_threads < 1) n_threads = 1;
  ld->slots.resize((size_t)ring_slots);
  for (auto& s : ld->slots) s.buf.resize((size_t)(batch * item_bytes));
  for (int i = 0; i < n_threads; ++i)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

// Blocks until the next in-order batch is ready, copies it into `out`
// (batch * item_bytes bytes). Returns 0 on success.
int wdno_shard_next(void* h, void* out) {
  auto* ld = (Loader*)h;
  if (!ld) return -1;
  uint64_t t = ld->read_ticket;
  Slot& s = ld->slots[t % ld->slots.size()];
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->cv_ready.wait(lk, [&] {
      return s.ready_ticket.load(std::memory_order_acquire) == (int64_t)t;
    });
  }
  std::memcpy(out, s.buf.data(), (size_t)(ld->batch * ld->item_bytes));
  ld->read_ticket = t + 1;
  {
    // same lost-wakeup hazard as fill(): a worker may have tested its
    // cv_free predicate and be about to block — advance `consumed` and
    // notify under the mutex so the wakeup cannot fall in that window
    std::lock_guard<std::mutex> lk(ld->mu);
    ld->consumed.fetch_add(1, std::memory_order_release);
  }
  ld->cv_free.notify_all();
  return 0;
}

void wdno_shard_close(void* h) {
  auto* ld = (Loader*)h;
  if (!ld) return;
  {
    std::lock_guard<std::mutex> lk(ld->mu);  // see fill(): no lost wakeups
    ld->stop.store(true);
  }
  ld->cv_free.notify_all();
  ld->cv_ready.notify_all();
  for (auto& w : ld->workers) w.join();
  if (ld->map) munmap((void*)ld->map, ld->map_len);
  if (ld->fd >= 0) close(ld->fd);
  delete ld;
}

}  // extern "C"
