// POSIX shared-memory seqlock publisher for per-frame control outputs.
//
// External ABI: the VisionPilotState POD layout and the "/visionpilot_state"
// segment name match the reference runtime bit-for-bit
// (VisionPilot/production_release/include/publisher/visionpilot_shared_state.hpp:34-126)
// so existing consumers (CAN gateways, safety monitors, bridges) keep
// working against the TPU pipeline unchanged.
//
// Seqlock protocol: writer bumps seq to odd, writes payload, bumps to even;
// readers retry while seq is odd or changed across the copy. Single writer.

#pragma once

#include <cstdint>

namespace avp::host {

struct VisionPilotState {
    volatile uint64_t seq;

    uint64_t frame_number;

    // lateral
    double steering_pid_deg;
    double steering_pid_raw_deg;
    double steering_autosteer_deg;
    bool autosteer_valid;

    double cte_m;
    double yaw_error_rad;
    double curvature_inv_m;
    bool path_valid;

    bool lane_departure_warning;

    // longitudinal
    bool cipo_exists;
    int cipo_track_id;
    int cipo_class_id;
    double cipo_distance_m;
    double cipo_velocity_ms;
    bool cut_in_detected;
    bool kalman_reset;

    double ideal_speed_ms;
    double safe_distance_m;
    bool fcw_active;
    bool aeb_active;

    double control_effort_ms2;

    // CAN / ego
    double ego_speed_ms;
    double ego_steering_angle_deg;
    bool can_valid;
};

class SharedState {
 public:
    explicit SharedState(const char* name = "/visionpilot_state",
                         bool owner = true);
    ~SharedState();

    SharedState(const SharedState&) = delete;
    SharedState& operator=(const SharedState&) = delete;

    bool ok() const { return ptr_ != nullptr; }

    // Owner-side: publish one consistent snapshot.
    void publish(const VisionPilotState& state);

    // Reader-side: block-free consistent snapshot (seqlock retry).
    void read(VisionPilotState* out) const;

    VisionPilotState* raw() const { return ptr_; }

 private:
    int fd_ = -1;
    VisionPilotState* ptr_ = nullptr;
    bool owner_ = false;
    char name_[64];
};

}  // namespace avp::host
