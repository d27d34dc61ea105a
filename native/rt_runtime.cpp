// Native real-time runtime primitives for nmpc_nav_control_tpu.
//
// The reference's runtime is a C++ ROS node: a ros::Timer drives the 40 Hz
// control cycle and roscpp's queues move messages between threads
// (src/nmpc_nav_control/NMPCNavControlROS.cpp:36-41,508-514).  The TPU build
// keeps the compute path in XLA but the host runtime around it is native
// too: this library provides
//
//   * rt_timer   — absolute-deadline periodic timer (clock_nanosleep on
//                  CLOCK_MONOTONIC) with p50/p99/max jitter and overrun
//                  accounting; the Python executor calls rt_timer_wait()
//                  once per cycle (the GIL is released during the ctypes
//                  call, so the wait itself runs native).
//   * spsc_ring  — wait-free single-producer/single-consumer ring buffer of
//                  fixed-size records with monotonic timestamps, for state
//                  ingest and command egress between an I/O thread and the
//                  control loop (the roscpp callback-queue analog).
//
// Plain C ABI; loaded from Python with ctypes (no pybind11 in this image).
// Build: g++ -O2 -shared -fPIC -o libnmpc_rt.so rt_runtime.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <ctime>
#include <vector>

namespace {

inline int64_t now_ns() {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return int64_t(ts.tv_sec) * 1000000000LL + ts.tv_nsec;
}

struct RtTimer {
    int64_t period_ns;
    int64_t next_deadline_ns;
    int64_t overruns;
    std::vector<int64_t> jitter_ns;  // wakeup lateness per cycle

    explicit RtTimer(double period_s)
        : period_ns(int64_t(period_s * 1e9)),
          next_deadline_ns(now_ns() + int64_t(period_s * 1e9)),
          overruns(0) {
        jitter_ns.reserve(1 << 16);
    }
};

// SPSC "lap" ring: the producer owns `head` and ALL slot contents; the
// consumer owns `tail`.  In overwrite (sensor-stream) mode the producer
// never touches `tail` — it simply keeps writing and publishing `head`,
// lapping the consumer; the consumer detects a lap AFTER copying a slot
// (head moved past slot+capacity during the copy) and retries from the
// oldest still-valid record.  Slot payloads are copied word-by-word through
// relaxed atomics, so a copy that races a lapping rewrite is VALIDATED
// rather than undefined behavior — the whole structure is data-race-free
// under the C++ memory model and verified clean under ThreadSanitizer by
// native/rt_runtime_stress.cpp (see tests/test_native.py).
struct SpscRing {
    // slot layout: word 0 = int64 timestamp_ns | payload words
    size_t record_size;            // payload bytes (API)
    size_t words_per_slot;         // 1 + ceil(record_size / 8)
    size_t capacity;               // number of records, power of two
    std::vector<std::atomic<uint64_t>> data;
    std::atomic<uint64_t> head;    // next write slot (producer-owned)
    std::atomic<uint64_t> tail;    // next read slot (consumer-owned)

    SpscRing(size_t rec, size_t cap)
        : record_size(rec), words_per_slot(1 + (rec + 7) / 8),
          capacity(cap), data(cap * (1 + (rec + 7) / 8)),
          head(0), tail(0) {}

    std::atomic<uint64_t>* slot(uint64_t idx) {
        return data.data() + (idx & (capacity - 1)) * words_per_slot;
    }

    // Producer: fill slot `idx` (relaxed stores; publication order is
    // provided by the release store of `head` afterwards).
    //
    // The leading release fence is what makes the consumer's lap validation
    // sound on weakly-ordered CPUs (aarch64): without it, the relaxed
    // payload stores of an overwriting write could become visible to the
    // consumer BEFORE the release store of `head` that preceded them in
    // program order (release only orders EARLIER accesses before itself),
    // so a consumer could copy a torn slot yet still observe the stale head
    // and pass the `h2 - t < capacity` check.  With the fence, fence-to-
    // fence pairing applies: if the consumer's relaxed slot loads read any
    // word stored after this fence, its acquire fence (in read_validated /
    // ring_pop_latest) makes everything sequenced before this fence —
    // including the head publication that preceded the overwrite — visible,
    // so the head re-load must return >= idx and the validation retries.
    // x86-TSO gets this ordering for free; ARM does not, and TSan cannot
    // flag the omission (no data race — the bug is ordering logic).
    void write_slot(uint64_t idx, const uint8_t* payload) {
        std::atomic_thread_fence(std::memory_order_release);
        std::atomic<uint64_t>* s = slot(idx);
        uint64_t w = uint64_t(now_ns());
        s[0].store(w, std::memory_order_relaxed);
        size_t full = record_size / 8, rem = record_size % 8;
        for (size_t i = 0; i < full; ++i) {
            std::memcpy(&w, payload + i * 8, 8);
            s[1 + i].store(w, std::memory_order_relaxed);
        }
        if (rem) {
            w = 0;
            std::memcpy(&w, payload + full * 8, rem);
            s[1 + full].store(w, std::memory_order_relaxed);
        }
    }

    // Consumer: copy slot `idx` (relaxed loads; caller validates after).
    void read_slot(uint64_t idx, int64_t* ts, uint8_t* payload) {
        std::atomic<uint64_t>* s = slot(idx);
        uint64_t w = s[0].load(std::memory_order_relaxed);
        std::memcpy(ts, &w, 8);
        size_t full = record_size / 8, rem = record_size % 8;
        for (size_t i = 0; i < full; ++i) {
            w = s[1 + i].load(std::memory_order_relaxed);
            std::memcpy(payload + i * 8, &w, 8);
        }
        if (rem) {
            w = s[1 + full].load(std::memory_order_relaxed);
            std::memcpy(payload + full * 8, &w, rem);
        }
    }

    // Consumer: copy the record at *t (clamped to the oldest still-valid
    // slot), retrying if the producer laps it mid-copy.  On return *t is
    // the index actually read and the copy is consistent.
    //
    // Lap arithmetic: a published head h means entries < h are complete and
    // the producer MAY be mid-write of entry h (head is bumped after the
    // slot write).  Entry t shares a slot with entry t+capacity, so the
    // copy of entry t is safe only if h < t + capacity — STRICT inequality.
    void read_validated(uint64_t* t, uint64_t h, int64_t* ts,
                        uint8_t* payload) {
        for (;;) {
            if (h - *t >= capacity) *t = h - capacity + 1;
            read_slot(*t, ts, payload);
            // Order the payload loads before the re-check of head.
            std::atomic_thread_fence(std::memory_order_acquire);
            uint64_t h2 = head.load(std::memory_order_acquire);
            if (h2 - *t < capacity) return;  // not lapped during the copy
            h = h2;
        }
    }
};

}  // namespace

extern "C" {

// ------------------------------ rt_timer --------------------------------- //

void* rt_timer_create(double period_s) { return new RtTimer(period_s); }

void rt_timer_destroy(void* t) { delete static_cast<RtTimer*>(t); }

// Sleep until the next deadline.  Returns the wakeup lateness in ns
// (negative never happens; 0 means on time).  If the deadline was already
// missed on entry, counts an overrun and rebases the schedule from now —
// matching ros::Timer's no-catch-up behavior for slow callbacks.
int64_t rt_timer_wait(void* tp) {
    RtTimer* t = static_cast<RtTimer*>(tp);
    int64_t now = now_ns();
    if (now > t->next_deadline_ns) {
        int64_t late = now - t->next_deadline_ns;
        t->overruns++;
        t->next_deadline_ns = now + t->period_ns;
        t->jitter_ns.push_back(late);
        return late;
    }
    timespec ts;
    ts.tv_sec = t->next_deadline_ns / 1000000000LL;
    ts.tv_nsec = t->next_deadline_ns % 1000000000LL;
    while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &ts, nullptr) != 0) {
    }
    int64_t late = now_ns() - t->next_deadline_ns;
    if (late < 0) late = 0;
    t->next_deadline_ns += t->period_ns;
    t->jitter_ns.push_back(late);
    return late;
}

int64_t rt_timer_overruns(void* tp) {
    return static_cast<RtTimer*>(tp)->overruns;
}

// Fills out[0..2] with p50/p99/max wakeup jitter in nanoseconds.
void rt_timer_jitter_stats(void* tp, int64_t* out) {
    RtTimer* t = static_cast<RtTimer*>(tp);
    if (t->jitter_ns.empty()) {
        out[0] = out[1] = out[2] = 0;
        return;
    }
    std::vector<int64_t> v(t->jitter_ns);
    std::sort(v.begin(), v.end());
    out[0] = v[v.size() / 2];
    out[1] = v[std::min(v.size() - 1, (v.size() * 99) / 100)];
    out[2] = v.back();
}

// ------------------------------ spsc_ring -------------------------------- //

void* ring_create(int64_t record_size, int64_t capacity_pow2) {
    // capacity must be a power of two >= 2 (masked indexing; the validated
    // read needs at least one slot of lap margin).
    if (capacity_pow2 < 2 || (capacity_pow2 & (capacity_pow2 - 1)) != 0)
        return nullptr;
    return new SpscRing(size_t(record_size), size_t(capacity_pow2));
}

void ring_destroy(void* r) { delete static_cast<SpscRing*>(r); }

// Producer: push one record (timestamped now).  Returns 1 on success,
// 0 if the ring is full (record dropped — freshest-wins policy is the
// caller's choice via ring_push_overwrite).  Keeps one slot of headroom
// (capacity-1 records usable): the consumer's validated read treats a slot
// with head - slot >= capacity as potentially mid-rewrite, so a bounded
// producer must never let a live record reach that distance.
int ring_push(void* rp, const uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail >= r->capacity - 1) return 0;
    r->write_slot(head, payload);
    r->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Producer: push, overwriting the oldest record when full (sensor-stream
// semantics: the control loop always sees the freshest state).  The
// producer never touches `tail` — it laps the consumer and the consumer's
// validated reads skip the overwritten records.
int ring_push_overwrite(void* rp, const uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    r->write_slot(head, payload);
    r->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Consumer: pop the oldest still-valid record.  Returns 1 and fills
// (timestamp_ns, payload) on success; 0 when empty.
int ring_pop(void* rp, int64_t* timestamp_ns, uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail == head) return 0;
    r->read_validated(&tail, head, timestamp_ns, payload);
    r->tail.store(tail + 1, std::memory_order_release);
    return 1;
}

// Consumer: drain to the freshest record (drop stale states). Returns the
// number of records dropped, or -1 when empty (nothing filled).
int64_t ring_pop_latest(void* rp, int64_t* timestamp_ns, uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail == head) return -1;
    uint64_t oldest =
        (head - tail >= r->capacity) ? head - r->capacity + 1 : tail;
    uint64_t last;
    for (;;) {
        last = head - 1;  // freshest published record
        r->read_slot(last, timestamp_ns, payload);
        std::atomic_thread_fence(std::memory_order_acquire);
        uint64_t h2 = r->head.load(std::memory_order_acquire);
        if (h2 - last < r->capacity) break;  // not lapped during the copy
        head = h2;                           // retry at the new freshest
    }
    r->tail.store(last + 1, std::memory_order_release);
    return int64_t(last - oldest);
}

int64_t ring_size(void* rp) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t n = r->head.load(std::memory_order_acquire) -
                 r->tail.load(std::memory_order_acquire);
    return int64_t(n > r->capacity ? r->capacity : n);
}

int64_t rt_now_ns() { return now_ns(); }

}  // extern "C"
