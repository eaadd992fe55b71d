// Concurrency stress for the seqlock shared state and the frame ring —
// built with -fsanitize=thread in the TSan configuration (an improvement
// over the reference, which ships no sanitizer coverage; SURVEY §5.2).
//
// Writer thread publishes continuously; reader threads verify snapshot
// consistency (all fields derive from frame_number). Exit code != 0 on
// any torn read; TSan reports races at runtime.

#include "avp/shared_state.hpp"
#include "avp/frame_ring.hpp"

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

using avp::host::SharedState;
using avp::host::VisionPilotState;
using avp::host::FrameRing;
using avp::host::FrameHeader;

int main() {
    std::atomic<bool> stop{false};
    std::atomic<int> errors{0};

    SharedState writer("/avp_tsan_state", true);
    if (!writer.ok()) {
        std::fprintf(stderr, "cannot create shm\n");
        return 2;
    }

    std::thread w([&] {
        VisionPilotState s{};
        for (uint64_t i = 1; i < 200000 && !stop.load(); ++i) {
            s.frame_number = i;
            s.steering_pid_deg = static_cast<double>(i);
            s.cte_m = static_cast<double>(i) * 2.0;
            s.ego_speed_ms = static_cast<double>(i) * 3.0;
            writer.publish(s);
        }
        stop.store(true);
    });

    std::vector<std::thread> readers;
    for (int r = 0; r < 3; ++r) {
        readers.emplace_back([&] {
            SharedState reader("/avp_tsan_state", false);
            VisionPilotState s{};
            while (!stop.load()) {
                reader.read(&s);
                const double f = static_cast<double>(s.frame_number);
                if (s.steering_pid_deg != f || s.cte_m != f * 2.0 ||
                    s.ego_speed_ms != f * 3.0) {
                    errors.fetch_add(1);
                }
            }
        });
    }

    // frame ring stress in parallel
    FrameRing ring("/avp_tsan_ring", true, 4, 64 * 64 * 3);
    std::thread rw([&] {
        std::vector<uint8_t> frame(64 * 64 * 3);
        for (uint64_t i = 1; i < 50000 && !stop.load(); ++i) {
            std::memset(frame.data(), static_cast<int>(i & 0xff),
                        frame.size());
            ring.publish(frame.data(), 64, 64, 3, i, i);
        }
    });
    std::thread rr([&] {
        FrameRing cons("/avp_tsan_ring", false);
        std::vector<uint8_t> out(64 * 64 * 3);
        FrameHeader h{};
        uint64_t last = 0;
        while (!stop.load()) {
            if (cons.read_latest(out.data(),
                                 static_cast<uint32_t>(out.size()), &h,
                                 last)) {
                last = h.frame_number;
                const uint8_t want =
                    static_cast<uint8_t>(h.frame_number & 0xff);
                for (size_t k = 0; k < out.size(); k += 997) {
                    if (out[k] != want) {
                        errors.fetch_add(1);
                        break;
                    }
                }
            }
        }
    });

    w.join();
    rw.join();
    for (auto& t : readers) t.join();
    rr.join();

    if (errors.load() != 0) {
        std::fprintf(stderr, "FAIL: %d inconsistent snapshots\n",
                     errors.load());
        return 1;
    }
    std::printf("OK: no torn reads\n");
    return 0;
}
