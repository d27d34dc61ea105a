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

struct SpscRing {
    // record layout: int64 timestamp_ns | payload[record_size] bytes
    size_t record_size;
    size_t capacity;             // number of records, power of two
    std::vector<uint8_t> data;
    std::atomic<uint64_t> head;  // next write slot (producer)
    std::atomic<uint64_t> tail;  // next read slot (consumer)

    SpscRing(size_t rec, size_t cap)
        : record_size(rec), capacity(cap), data(cap * (rec + 8)),
          head(0), tail(0) {}

    size_t slot_bytes() const { return record_size + 8; }
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
    // capacity must be a power of two (masked indexing).
    if (capacity_pow2 <= 0 || (capacity_pow2 & (capacity_pow2 - 1)) != 0)
        return nullptr;
    return new SpscRing(size_t(record_size), size_t(capacity_pow2));
}

void ring_destroy(void* r) { delete static_cast<SpscRing*>(r); }

// Producer: push one record (timestamped now).  Returns 1 on success,
// 0 if the ring is full (record dropped — freshest-wins policy is the
// caller's choice via ring_push_overwrite).
int ring_push(void* rp, const uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail >= r->capacity) return 0;
    uint8_t* slot = r->data.data() + (head & (r->capacity - 1)) * r->slot_bytes();
    int64_t ts = now_ns();
    std::memcpy(slot, &ts, 8);
    std::memcpy(slot + 8, payload, r->record_size);
    r->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Producer: push, overwriting the oldest record when full (sensor-stream
// semantics: the control loop always sees the freshest state).
int ring_push_overwrite(void* rp, const uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail >= r->capacity) {
        // Advance tail (drop oldest). Safe for SPSC-with-one-overwriter use.
        r->tail.store(tail + 1, std::memory_order_release);
    }
    return ring_push(rp, payload);
}

// Consumer: pop the oldest record.  Returns 1 and fills (timestamp_ns,
// payload) on success; 0 when empty.
int ring_pop(void* rp, int64_t* timestamp_ns, uint8_t* payload) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail == head) return 0;
    const uint8_t* slot =
        r->data.data() + (tail & (r->capacity - 1)) * r->slot_bytes();
    std::memcpy(timestamp_ns, slot, 8);
    std::memcpy(payload, slot + 8, r->record_size);
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
    uint64_t last = head - 1;
    const uint8_t* slot =
        r->data.data() + (last & (r->capacity - 1)) * r->slot_bytes();
    std::memcpy(timestamp_ns, slot, 8);
    std::memcpy(payload, slot + 8, r->record_size);
    r->tail.store(head, std::memory_order_release);
    return int64_t(last - tail);
}

int64_t ring_size(void* rp) {
    SpscRing* r = static_cast<SpscRing*>(rp);
    return int64_t(r->head.load(std::memory_order_acquire) -
                   r->tail.load(std::memory_order_acquire));
}

int64_t rt_now_ns() { return now_ns(); }

}  // extern "C"
