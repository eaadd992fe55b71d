// frame_node: publishes raw BGR frames on the "VisionPilot/RawFrames"
// zero-copy service (reference contract:
// VisionPilot/middleware_recipes/IceOryx2/frame_node.cpp — loan the
// sample first, decode the frame DIRECTLY into shared memory, publish).
//
// Sources: a synthetic approaching-vehicle scene (self-contained demo /
// CI), or a raw file of concatenated BGR frames (the Python tooling
// writes these; keeps the node free of OpenCV/GStreamer deps — the
// GStreamer source lives in drivers/gstreamer.py on the Python side).

#include <atomic>
#include <chrono>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>

#include "avp/iox2.hpp"
#include "transmission_data.hpp"

using avp::iox2::Publisher;
using avp::iox2::open_or_create;
using avp::iox2msg::RawFrame;

static std::atomic<bool> g_run{true};
static void on_sig(int) { g_run = false; }

static uint64_t now_ns() {
    return std::chrono::duration_cast<std::chrono::nanoseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

// Synthetic driving scene: road gradient + a dark vehicle rectangle that
// approaches over time (its bbox height grows), so the downstream blob
// detector + Kalman produce a closing CIPO with negative velocity.
static void render_scene(uint8_t* bgr, uint32_t w, uint32_t h,
                         uint64_t t) {
    for (uint32_t y = 0; y < h; ++y) {
        uint8_t road = static_cast<uint8_t>(90 + 60 * y / h);
        uint8_t* row = bgr + static_cast<size_t>(y) * w * 3;
        for (uint32_t x = 0; x < w; ++x) {
            row[3 * x + 0] = road;
            row[3 * x + 1] = road;
            row[3 * x + 2] = static_cast<uint8_t>(road / 2 + 100);
        }
    }
    // vehicle: grows from 8% to 30% of frame height over 300 frames
    float scale = 0.08f + 0.22f * static_cast<float>(t % 300) / 300.0f;
    uint32_t vh = static_cast<uint32_t>(scale * h);
    uint32_t vw = vh * 3 / 2;
    uint32_t cx = w / 2, cy = h * 2 / 3;
    uint32_t x0 = cx - vw / 2, y0 = cy - vh / 2;
    for (uint32_t y = y0; y < y0 + vh && y < h; ++y) {
        uint8_t* row = bgr + static_cast<size_t>(y) * w * 3;
        for (uint32_t x = x0; x < x0 + vw && x < w; ++x) {
            row[3 * x + 0] = 25;
            row[3 * x + 1] = 22;
            row[3 * x + 2] = 28;
        }
    }
}

int main(int argc, char** argv) {
    std::string source = "synthetic";
    uint32_t width = 640, height = 360;
    uint64_t frames = 0;  // 0 = unbounded
    double fps = 0.0;     // 0 = max speed
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        auto next = [&]() { return std::string(argv[++i]); };
        if (a == "--source") source = next();
        else if (a == "--width") width = std::stoul(next());
        else if (a == "--height") height = std::stoul(next());
        else if (a == "--frames") frames = std::stoull(next());
        else if (a == "--fps") fps = std::stod(next());
        else {
            std::fprintf(stderr,
                         "usage: %s [--source synthetic|<frames.bgr>] "
                         "[--width W] [--height H] [--frames N] [--fps F]\n",
                         argv[0]);
            return 1;
        }
    }
    if (width > avp::iox2msg::kMaxWidth ||
        height > avp::iox2msg::kMaxHeight) {
        std::fprintf(stderr, "frame exceeds RawFrame payload (%ux%u max)\n",
                     avp::iox2msg::kMaxWidth, avp::iox2msg::kMaxHeight);
        return 1;
    }
    std::signal(SIGINT, on_sig);
    std::signal(SIGTERM, on_sig);

    auto* svc = open_or_create<RawFrame>("VisionPilot/RawFrames",
                                         /*n_slots=*/2, /*create=*/true);
    if (svc == nullptr || !svc->ok()) {
        std::fprintf(stderr, "[frame_node] service creation failed\n");
        return 1;
    }
    Publisher<RawFrame> pub(svc);
    std::printf("[frame_node] publishing %ux%u on VisionPilot/RawFrames\n",
                width, height);

    std::ifstream raw;
    if (source != "synthetic") {
        raw.open(source, std::ios::binary);
        if (!raw) {
            std::fprintf(stderr, "[frame_node] cannot open %s\n",
                         source.c_str());
            return 1;
        }
    }

    const size_t frame_bytes = static_cast<size_t>(width) * height * 3;
    const auto period = fps > 0.0
        ? std::chrono::duration<double>(1.0 / fps)
        : std::chrono::duration<double>(0.0);
    uint64_t frame_id = 0;
    auto next_due = std::chrono::steady_clock::now();
    while (g_run && (frames == 0 || frame_id < frames)) {
        const uint64_t capture_ns = now_ns();
        auto sample = pub.loan_uninit();
        RawFrame& f = sample.payload_mut();
        if (source == "synthetic") {
            render_scene(f.data, width, height, frame_id);
        } else {
            raw.read(reinterpret_cast<char*>(f.data),
                     static_cast<std::streamsize>(frame_bytes));
            if (raw.gcount() != static_cast<std::streamsize>(frame_bytes))
                break;  // end of file
        }
        f.frame_id = frame_id++;
        f.capture_timestamp_ns = capture_ns;
        f.width = width;
        f.height = height;
        f.channels = 3;
        f.step = width * 3;
        f.is_valid = true;
        f.source_id = 0;
        f.publish_timestamp_ns = now_ns();
        send(std::move(sample));

        if (fps > 0.0) {
            next_due += std::chrono::duration_cast<
                std::chrono::steady_clock::duration>(period);
            std::this_thread::sleep_until(next_due);
        }
        if (frame_id % 100 == 0)
            std::printf("[frame_node] published %llu frames\n",
                        static_cast<unsigned long long>(frame_id));
    }
    std::printf("[frame_node] done, %llu frames\n",
                static_cast<unsigned long long>(frame_id));
    // linger so slow subscribers can drain the last samples
    std::this_thread::sleep_for(std::chrono::milliseconds(300));
    delete svc;
    return 0;
}
