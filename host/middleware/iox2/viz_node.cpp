// viz_node: subscribes both services ("VisionPilot/RawFrames" +
// "VisionPilot/CIPO"), joins them by frame_id, and emits the overlay
// state (headless: CSV flight-recorder rows + console HUD lines; the
// reference draws an OpenCV window — viz_node.cpp in
// VisionPilot/middleware_recipes/IceOryx2/). The graphical overlay
// path of this framework lives in utils/visualization.py; this node is
// the Python-free consumer proving the join semantics and IPC
// latencies end-to-end.

#include <atomic>
#include <chrono>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <memory>
#include <string>
#include <thread>
#include <map>

#include "avp/iox2.hpp"
#include "transmission_data.hpp"

using avp::iox2::Subscriber;
using avp::iox2::open_or_create;
using avp::iox2msg::CIPOMessage;
using avp::iox2msg::RawFrame;

static std::atomic<bool> g_run{true};
static void on_sig(int) { g_run = false; }

struct FrameMeta {
    uint64_t capture_ns;
    uint32_t width, height;
};

int main(int argc, char** argv) {
    uint64_t max_msgs = 0;
    std::string csv_path;
    bool quiet = false;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--frames") max_msgs = std::stoull(argv[++i]);
        else if (a == "--csv") csv_path = argv[++i];
        else if (a == "--quiet") quiet = true;
    }
    std::signal(SIGINT, on_sig);
    std::signal(SIGTERM, on_sig);

    auto* fsvc = open_or_create<RawFrame>("VisionPilot/RawFrames", 2,
                                          false);
    auto* csvc = open_or_create<CIPOMessage>("VisionPilot/CIPO", 8,
                                             false);
    if (fsvc == nullptr || csvc == nullptr) {
        std::fprintf(stderr, "[viz_node] services not available\n");
        return 1;
    }
    Subscriber<CIPOMessage> cipo_sub(csvc);

    std::FILE* csv = nullptr;
    if (!csv_path.empty()) {
        csv = std::fopen(csv_path.c_str(), "w");
        if (csv != nullptr)
            std::fprintf(csv,
                         "frame_id,exists,track_id,class_id,distance_m,"
                         "velocity_ms,cut_in,kalman_reset,infer_ms,"
                         "track_ms,ipc_us,frame_seen,e2e_ms\n");
    }

    // frame metadata ring for the frame_id join (the 7.4 MB payloads are
    // copied into one reusable buffer, only the metadata is retained)
    auto frame = std::make_unique<RawFrame>();
    // ordered by frame_id so eviction drops the OLDEST frame,
    // not an arbitrary bucket (which could evict the newest)
    std::map<uint64_t, FrameMeta> meta;
    uint64_t frame_seen = 0, cipo_seen = 0, joined = 0;
    uint64_t frames_last = 0;

    while (g_run && (max_msgs == 0 || joined < max_msgs)) {
        bool any = false;
        uint64_t lost = 0;
        while (fsvc->receive(frame.get(), &frames_last, &lost)) {
            meta[frame->frame_id] = {frame->capture_timestamp_ns,
                                     frame->width, frame->height};
            if (meta.size() > 64)  // bound the join window: oldest out
                meta.erase(meta.begin());
            ++frame_seen;
            any = true;
        }
        if (auto s = cipo_sub.receive()) {
            const CIPOMessage& m = s->payload();
            ++cipo_seen;
            ++joined;
            any = true;
            const auto it = meta.find(m.frame_id);
            const bool have_frame = it != meta.end();
            float e2e_ms = 0.0f;
            if (have_frame)
                e2e_ms = (m.publish_timestamp_ns - it->second.capture_ns) /
                         1e6f;
            if (!quiet) print_cipo(m);
            if (csv != nullptr)
                std::fprintf(csv,
                             "%llu,%d,%d,%d,%.3f,%.3f,%d,%d,%.3f,%.3f,"
                             "%.1f,%d,%.3f\n",
                             static_cast<unsigned long long>(m.frame_id),
                             m.exists ? 1 : 0, m.track_id, m.class_id,
                             m.distance_m, m.velocity_ms,
                             m.cut_in_detected ? 1 : 0,
                             m.kalman_reset ? 1 : 0,
                             m.inference_latency_ms, m.tracking_latency_ms,
                             m.ipc_latency_us, have_frame ? 1 : 0, e2e_ms);
        }
        if (!any)
            std::this_thread::sleep_for(std::chrono::milliseconds(1));
    }
    if (csv != nullptr) std::fclose(csv);
    std::printf("[viz_node] frames=%llu cipo=%llu joined=%llu\n",
                static_cast<unsigned long long>(frame_seen),
                static_cast<unsigned long long>(cipo_seen),
                static_cast<unsigned long long>(joined));
    delete fsvc;
    delete csvc;
    return 0;
}
