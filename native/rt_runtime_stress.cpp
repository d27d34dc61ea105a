// Concurrency stress + sanitizer harness for the SPSC ring in
// rt_runtime.cpp.  Built and run by tests/test_native.py twice: plain -O2
// (invariant checks under real contention) and -fsanitize=thread (data-race
// verification — the reference ships no sanitizer coverage at all, its
// build is -Wall only, /root/reference/CMakeLists.txt:14-16).
//
// Invariants checked under a free-running producer/consumer pair:
//   * no torn reads: each record carries its sequence number twice; both
//     halves must always match (a racy unvalidated copy would tear);
//   * monotonicity: pop/pop_latest yield strictly increasing sequence
//     numbers and non-decreasing timestamps (freshest-wins never rewinds);
//   * bounded FIFO mode (no overwrite): lossless exact 0..n-1 delivery.
//
// Build: g++ -O2 [-fsanitize=thread] -o rt_stress
//            rt_runtime_stress.cpp rt_runtime.cpp -lpthread
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

extern "C" {
void* ring_create(int64_t record_size, int64_t capacity_pow2);
void ring_destroy(void* r);
int ring_push(void* rp, const uint8_t* payload);
int ring_push_overwrite(void* rp, const uint8_t* payload);
int ring_pop(void* rp, int64_t* timestamp_ns, uint8_t* payload);
int64_t ring_pop_latest(void* rp, int64_t* timestamp_ns, uint8_t* payload);
int64_t ring_size(void* rp);
}

namespace {

int failures = 0;

void check(bool ok, const char* what) {
    if (!ok) {
        std::fprintf(stderr, "FAIL: %s\n", what);
        ++failures;
    }
}

struct Rec {
    uint64_t seq;
    uint64_t seq_copy;  // torn-read detector
};

// Overwriting producer lapping a slow consumer; pop_latest semantics.
void stress_overwrite(int64_t capacity, uint64_t n, bool pop_oldest) {
    void* r = ring_create(sizeof(Rec), capacity);
    check(r != nullptr, "ring_create");
    std::atomic<bool> done{false};

    std::thread producer([&] {
        Rec rec;
        for (uint64_t i = 0; i < n; ++i) {
            rec.seq = rec.seq_copy = i;
            ring_push_overwrite(r, reinterpret_cast<const uint8_t*>(&rec));
        }
        done.store(true, std::memory_order_release);
    });

    uint64_t last_seq = 0;
    bool have_last = false;
    int64_t last_ts = 0;
    uint64_t got = 0;
    Rec rec;
    int64_t ts;
    for (;;) {
        bool fin = done.load(std::memory_order_acquire);
        bool any = pop_oldest
                       ? ring_pop(r, &ts, reinterpret_cast<uint8_t*>(&rec)) == 1
                       : ring_pop_latest(
                             r, &ts, reinterpret_cast<uint8_t*>(&rec)) >= 0;
        if (any) {
            ++got;
            check(rec.seq == rec.seq_copy, "torn read (seq halves differ)");
            if (have_last) {
                check(rec.seq > last_seq, "sequence went backwards");
                check(ts >= last_ts, "timestamp went backwards");
            }
            last_seq = rec.seq;
            last_ts = ts;
            have_last = true;
        } else if (fin) {
            break;
        }
    }
    producer.join();
    check(got > 0, "consumer starved");
    check(have_last && last_seq == n - 1, "freshest record not delivered");
    ring_destroy(r);
}

// Bounded lossless FIFO (non-overwrite push with producer-side spinning).
void stress_fifo(int64_t capacity, uint64_t n) {
    void* r = ring_create(sizeof(Rec), capacity);
    std::thread producer([&] {
        Rec rec;
        for (uint64_t i = 0; i < n; ++i) {
            rec.seq = rec.seq_copy = i;
            while (!ring_push(r, reinterpret_cast<const uint8_t*>(&rec))) {
            }
        }
    });
    Rec rec;
    int64_t ts;
    for (uint64_t i = 0; i < n;) {
        if (ring_pop(r, &ts, reinterpret_cast<uint8_t*>(&rec))) {
            check(rec.seq == i, "FIFO order broken");
            check(rec.seq == rec.seq_copy, "torn read in FIFO mode");
            ++i;
        }
    }
    producer.join();
    check(ring_size(r) == 0, "ring not drained");
    ring_destroy(r);
}

}  // namespace

int main(int argc, char** argv) {
    // Optional argv[1]: iteration scale (default 1000000; tests pass a
    // smaller value to bound CI time, CLI runs can crank it up).
    uint64_t scale = 1000000;
    if (argc > 1) scale = std::strtoull(argv[1], nullptr, 10);
    // Small capacities maximize lap pressure (the racy regime).
    stress_overwrite(/*capacity=*/4, /*n=*/2 * scale, /*pop_oldest=*/false);
    stress_overwrite(/*capacity=*/8, /*n=*/2 * scale, /*pop_oldest=*/true);
    stress_fifo(/*capacity=*/16, /*n=*/scale);
    if (failures) {
        std::fprintf(stderr, "%d invariant failure(s)\n", failures);
        return 1;
    }
    std::puts("rt_runtime stress: OK");
    return 0;
}
