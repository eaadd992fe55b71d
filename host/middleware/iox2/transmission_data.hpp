// POD payloads of the IceOryx2 middleware recipe's two services.
//
// ABI contract reproduced field-for-field from the reference
// (VisionPilot/middleware_recipes/IceOryx2/transmission_data.hpp): an
// external subscriber built against the reference header must be able
// to consume our samples byte-for-byte, so field order, types, and the
// fixed 1920x1280x3 payload size are load-bearing and cannot differ.
// Everything else (methods, printing) is ours.

#ifndef AVP_IOX2_TRANSMISSION_DATA_HPP
#define AVP_IOX2_TRANSMISSION_DATA_HPP

#include <cstdint>
#include <cstdio>

namespace avp::iox2msg {

inline constexpr uint32_t kMaxWidth = 1920;
inline constexpr uint32_t kMaxHeight = 1280;

// Zero-copy raw BGR frame (service "VisionPilot/RawFrames").
struct RawFrame {
    uint64_t frame_id;
    uint64_t capture_timestamp_ns;
    uint64_t publish_timestamp_ns;
    uint32_t width;
    uint32_t height;
    uint32_t channels;
    uint32_t step;           // row stride, bytes
    uint8_t data[kMaxWidth * kMaxHeight * 3];
    bool is_valid;
    uint8_t source_id;
};

// CIPO (closest in-path object) tracking output
// (service "VisionPilot/CIPO").
struct CIPOMessage {
    uint64_t frame_id;
    uint64_t timestamp_ns;
    uint64_t publish_timestamp_ns;

    bool exists;
    int32_t track_id;        // -1 when no CIPO
    int32_t class_id;        // CIPO level 1/2/3
    float distance_m;
    float velocity_ms;       // Kalman-filtered

    float bbox_x1, bbox_y1, bbox_x2, bbox_y2;
    float confidence;

    bool cut_in_detected;
    bool kalman_reset;

    uint8_t num_tracked_objects;
    float inference_latency_ms;
    float tracking_latency_ms;
    float ipc_latency_us;    // frame publish -> inference receive
};

inline void print_cipo(const CIPOMessage& m) {
    if (m.exists) {
        std::printf("Frame %llu | CIPO track %d (level %d) dist=%.1fm "
                    "vel=%.2fm/s%s%s | infer %.2fms track %.2fms ipc %.0fus\n",
                    static_cast<unsigned long long>(m.frame_id), m.track_id,
                    m.class_id, m.distance_m, m.velocity_ms,
                    m.cut_in_detected ? " CUT-IN" : "",
                    m.kalman_reset ? " RESET" : "",
                    m.inference_latency_ms, m.tracking_latency_ms,
                    m.ipc_latency_us);
    } else {
        std::printf("Frame %llu | no CIPO (%u tracked)\n",
                    static_cast<unsigned long long>(m.frame_id),
                    m.num_tracked_objects);
    }
}

}  // namespace avp::iox2msg

#endif  // AVP_IOX2_TRANSMISSION_DATA_HPP
