// CAN bus reader for the native app: live SocketCAN or Vector .asc
// replay, decoding ego speed (frame 0xA1, LE uint16 x 0.01 m/s) and
// steering angle (0xA4, LE int16 x 0.1 deg) — the reference's
// can_interface.cpp contract (polled once per captured frame,
// production_release/main.cpp:427-432; graceful degradation when the
// bus is absent, main.cpp:1832-1840). Mirrors this repo's Python
// drivers/can_interface.py so both runtimes accept the same .asc logs.

#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace avp::can {

constexpr uint32_t kSpeedFrameId = 0xA1;
constexpr uint32_t kSteeringFrameId = 0xA4;

struct VehicleState {
    // NaN until a decodable frame arrives (Python-driver parity:
    // valid is derived as !isnan(speed))
    double speed_ms = __builtin_nan("");
    double steering_angle_deg = __builtin_nan("");
    bool valid = false;
};

class CanReader {
 public:
    // iface_or_asc: a SocketCAN interface name ("can0", "vcan0") or a
    // path to a Vector .asc log (detected by the ".asc" suffix).
    explicit CanReader(const std::string& iface_or_asc);
    ~CanReader();

    bool ok() const { return fd_ >= 0 || !replay_.empty(); }

    // Drain pending frames (live) or replay frames up to `now_s`
    // seconds since the first update() call, then return the latest
    // decoded state.
    const VehicleState& update(double now_s);

    const VehicleState& state() const { return state_; }

 private:
    struct ReplayFrame {
        double t;
        uint32_t id;
        uint8_t len;
        uint8_t data[8];
    };

    void apply(uint32_t id, const uint8_t* data, size_t len);
    void load_asc(const std::string& path);

    int fd_ = -1;
    std::vector<ReplayFrame> replay_;
    size_t replay_pos_ = 0;
    double replay_t0_ = -1.0;
    VehicleState state_;
};

}  // namespace avp::can
