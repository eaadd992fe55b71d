// inference_node: subscribes "VisionPilot/RawFrames", detects the
// closest in-path object, tracks its distance with a 1D
// constant-velocity Kalman filter, and publishes "VisionPilot/CIPO".
//
// Reference contract: VisionPilot/middleware_recipes/IceOryx2/
// inference_node.cpp (AutoSpeed ONNX + ObjectFinder -> CIPOMessage with
// per-stage latencies). In this framework the neural detector is the
// TPU-resident jitted AutoSpeed program — driven either from the Python
// pipeline attached to the same services via middleware/iox2_transport,
// or from the Python-free StableHLO app (host/tools/visionpilot_app).
// This node keeps the SERVICE contract runnable standalone with a
// classical luminance-blob detector + pinhole range model, i.e. the
// IPC/tracking layer with no ML dependency.

#include <atomic>
#include <chrono>
#include <cmath>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <thread>

#include "avp/iox2.hpp"
#include "transmission_data.hpp"

using avp::iox2::Publisher;
using avp::iox2::Subscriber;
using avp::iox2::open_or_create;
using avp::iox2msg::CIPOMessage;
using avp::iox2msg::RawFrame;

static std::atomic<bool> g_run{true};
static void on_sig(int) { g_run = false; }

static uint64_t now_ns() {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

struct BBox {
    float x1, y1, x2, y2;
    bool valid = false;
    float iou(const BBox& o) const {
        float ix1 = std::max(x1, o.x1), iy1 = std::max(y1, o.y1);
        float ix2 = std::min(x2, o.x2), iy2 = std::min(y2, o.y2);
        float iw = std::max(0.0f, ix2 - ix1), ih = std::max(0.0f, iy2 - iy1);
        float inter = iw * ih;
        float uni = (x2 - x1) * (y2 - y1) + (o.x2 - o.x1) * (o.y2 - o.y1) -
                    inter;
        return uni > 0.0f ? inter / uni : 0.0f;
    }
};

// Dark-blob detector: bounding box of pixels whose BGR channels are all
// below a threshold, sampled at stride 2. Stands in for the AutoSpeed
// detector in the ML-free build of this node.
static BBox detect_dark_blob(const RawFrame& f, uint8_t thresh = 60) {
    BBox b{1e9f, 1e9f, -1e9f, -1e9f, false};
    uint32_t hits = 0;
    for (uint32_t y = 0; y < f.height; y += 2) {
        const uint8_t* row = f.data + static_cast<size_t>(y) * f.step;
        for (uint32_t x = 0; x < f.width; x += 2) {
            const uint8_t* p = row + 3 * x;
            if (p[0] < thresh && p[1] < thresh && p[2] < thresh) {
                b.x1 = std::min(b.x1, static_cast<float>(x));
                b.y1 = std::min(b.y1, static_cast<float>(y));
                b.x2 = std::max(b.x2, static_cast<float>(x));
                b.y2 = std::max(b.y2, static_cast<float>(y));
                ++hits;
            }
        }
    }
    b.valid = hits > 20;
    return b;
}

// 1D constant-velocity Kalman on CIPO distance — the same filter shape
// as perception/tracking.KalmanFilter1D (reference:
// production_release/src/tracking/kalman_filter.cpp).
struct Kalman1D {
    float pos = 0, vel = 0;
    float p00 = 25, p01 = 0, p10 = 0, p11 = 9;
    bool init = false;
    static constexpr float kQ = 0.05f, kR = 1.0f;

    void reset(float z) {
        pos = z;
        vel = 0;
        p00 = 25; p01 = 0; p10 = 0; p11 = 9;
        init = true;
    }
    void step(float z, float dt) {
        if (!init) { reset(z); return; }
        // predict
        pos += vel * dt;
        p00 += dt * (p01 + p10 + dt * p11) + kQ;
        p01 += dt * p11;
        p10 += dt * p11;
        p11 += kQ;
        // update (H=[1,0])
        float s = p00 + kR;
        float k0 = p00 / s, k1 = p10 / s;
        float r = z - pos;
        pos += k0 * r;
        vel += k1 * r;
        p00 *= (1 - k0);
        p01 *= (1 - k0);
        p10 -= k1 * p00;
        p11 -= k1 * p01;
    }
};

int main(int argc, char** argv) {
    uint64_t max_frames = 0;
    bool quiet = false;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--frames") max_frames = std::stoull(argv[++i]);
        else if (a == "--quiet") quiet = true;
    }
    std::signal(SIGINT, on_sig);
    std::signal(SIGTERM, on_sig);

    auto* fsvc = open_or_create<RawFrame>("VisionPilot/RawFrames",
                                          2, /*create=*/false);
    if (fsvc == nullptr) {
        std::fprintf(stderr, "[inference_node] RawFrames service missing\n");
        return 1;
    }
    auto* csvc = open_or_create<CIPOMessage>("VisionPilot/CIPO",
                                             8, /*create=*/true);
    if (csvc == nullptr || !csvc->ok()) {
        std::fprintf(stderr, "[inference_node] CIPO service create failed\n");
        return 1;
    }
    Publisher<CIPOMessage> pub(csvc);
    std::printf("[inference_node] VisionPilot/RawFrames -> "
                "VisionPilot/CIPO\n");

    // receive() copies the POD out of the ring; reuse one heap buffer
    auto frame = std::make_unique<RawFrame>();
    Kalman1D kf;
    BBox prev{};
    int32_t track_id = -1;
    uint64_t prev_ts = 0;
    uint64_t processed = 0;
    uint64_t last_seen = 0;
    constexpr float kFocalPx1920 = 900.0f;  // pinhole range model
    constexpr float kVehicleH = 1.5f;       // assumed CIPO height, meters

    while (g_run && (max_frames == 0 || processed < max_frames)) {
        const uint64_t recv_ns = now_ns();
        uint64_t lost = 0;
        // receive-into the reusable buffer (7.4 MB POD: the Subscriber<T>
        // wrapper would copy it by value; large payloads use the core)
        if (!fsvc->receive(frame.get(), &last_seen, &lost)) {
            std::this_thread::sleep_for(std::chrono::milliseconds(1));
            continue;
        }
        if (!frame->is_valid) continue;
        const float ipc_us =
            (recv_ns - frame->publish_timestamp_ns) / 1000.0f;

        const uint64_t inf_t0 = now_ns();
        BBox det = detect_dark_blob(*frame);
        const float infer_ms = (now_ns() - inf_t0) / 1e6f;

        const uint64_t trk_t0 = now_ns();
        bool cut_in = false, kreset = false;
        float dist = 0, vel = 0;
        if (det.valid) {
            const float focal = kFocalPx1920 * frame->width / 1920.0f;
            const float bbox_h = det.y2 - det.y1;
            const float z = focal * kVehicleH / std::max(bbox_h, 1.0f);
            const float dt = prev_ts != 0
                ? (frame->capture_timestamp_ns - prev_ts) / 1e9f
                : 0.0f;
            if (track_id < 0 || (prev.valid && det.iou(prev) < 0.2f)) {
                // identity change: new track, reset the filter
                // (reference: ObjectFinder ORB-verified CIPO switch ->
                // kalman_reset / cut_in flags)
                kreset = track_id >= 0;
                const float cx = 0.5f * (det.x1 + det.x2);
                cut_in = kreset && cx > frame->width / 3.0f &&
                         cx < frame->width * 2.0f / 3.0f;
                ++track_id;
                kf.reset(z);
            } else {
                kf.step(z, dt > 0 ? dt : 0.033f);
            }
            dist = kf.pos;
            vel = kf.vel;
            prev = det;
            prev_ts = frame->capture_timestamp_ns;
        }
        const float track_ms = (now_ns() - trk_t0) / 1e6f;

        auto sample = pub.loan_uninit();
        CIPOMessage& m = sample.payload_mut();
        std::memset(&m, 0, sizeof(m));
        m.frame_id = frame->frame_id;
        m.timestamp_ns = now_ns();
        m.exists = det.valid;
        m.track_id = det.valid ? track_id : -1;
        m.class_id = det.valid ? 1 : 0;
        m.distance_m = dist;
        m.velocity_ms = vel;
        m.bbox_x1 = det.x1;
        m.bbox_y1 = det.y1;
        m.bbox_x2 = det.x2;
        m.bbox_y2 = det.y2;
        m.confidence = det.valid ? 0.9f : 0.0f;
        m.cut_in_detected = cut_in;
        m.kalman_reset = kreset;
        m.num_tracked_objects = det.valid ? 1 : 0;
        m.inference_latency_ms = infer_ms;
        m.tracking_latency_ms = track_ms;
        m.ipc_latency_us = ipc_us;
        m.publish_timestamp_ns = now_ns();
        send(std::move(sample));

        ++processed;
        if (!quiet && processed % 50 == 0) print_cipo(m);
    }
    std::printf("[inference_node] done, %llu frames processed\n",
                static_cast<unsigned long long>(processed));
    std::this_thread::sleep_for(std::chrono::milliseconds(300));
    delete csvc;
    delete fsvc;
    return 0;
}
