// Parity harness for the native longitudinal stack.
//
// Drives avp::lon::{ObjectFinder, SpeedPlanner, PIController} with a
// detection-table sequence from a .npy file and prints one CSV row per
// frame, so tests/test_native_longitudinal.py can assert step-for-step
// parity against the Python stack (perception/tracking.py + control/*)
// — the same wiring order as runtime/pipeline.py:_harvest.
//
// Usage:
//   longitudinal_harness --dets <f32 (T,D,7) npy> --hom <f32 (9,) npy>
//       [--img-w 1280] [--img-h 720] [--dt 0.1] [--ego 10.0]
//       [--kp 0.5] [--ki 0.1] [--kd 0.05]
//
// Row: frame,exists,track_id,class_id,distance,velocity,cutin,reset,
//      set_speed,safe_d,fcw,aeb,effort,n_tracks

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "avp/longitudinal.hpp"
#include "npy_io.hpp"

// Self-test of the CIPO model-confusion Kalman transfer (the one path
// the Python-parity scenarios cannot reach: it needs frame crops, and
// the two runtimes' cut-in discriminators differ by design — ORB vs
// histogram). Python semantics: prev_tracks aliases objects mutated IN
// PLACE by update(), so the transferred filter carries THIS frame's
// predict+update. A value-semantics port that snapshots the old structs
// restores a one-frame-stale filter instead; this test replicates the
// donor track's filter manually and requires the transferred state to
// equal the CURRENT-frame values exactly.
static int selftest_transfer() {
  const int W = 1280, H = 720;
  // distance = 0.1 * image y of the bbox bottom (see matrix)
  const double hom[9] = {0, 0, 0, 0, 0.1, 0, 0, 0, 1};
  avp::lon::ObjectFinder finder(hom, W, H);
  std::vector<uint8_t> frame((size_t)W * H * 3, 10);
  auto paint = [&](int x1, int y1, int x2, int y2) {
    for (int y = y1; y < y2; ++y)
      for (int x = x1; x < x2; ++x) {
        uint8_t* p = frame.data() + ((size_t)y * W + x) * 3;
        p[0] = 200; p[1] = 50; p[2] = 50;
      }
  };
  avp::lon::Kalman1D manual;  // replicates track A's filter
  const double dt = 0.1;
  // frames 0..3: class-1 car A approaching (bottom y = 600 - 40t)
  for (int t = 0; t < 4; ++t) {
    const double y2 = 600.0 - 40.0 * t;
    std::fill(frame.begin(), frame.end(), 10);
    paint(340, (int)y2 - 100, 460, (int)y2);
    std::vector<avp::lon::Detection> dets{
        {340, y2 - 100, 460, y2, 0.9, 1}};
    finder.update_and_get_cipo(dets, t * dt, frame.data());
    const double measured =
        std::hypot(0.0, 0.1 * (double)(int)y2);  // bottom-center world
    if (t == 0) {
      manual.initialize(measured);
    } else {
      manual.predict(dt);
      manual.update(measured);
    }
  }
  // frame 4: A still tracked AND a closer same-looking class-2 object B
  // -> CIPO switches to B, histogram match -> model confusion -> B
  // inherits A's filter AS OF THIS FRAME.
  const double yA = 600.0 - 40.0 * 4, yB = 300.0;
  std::fill(frame.begin(), frame.end(), 10);
  paint(340, (int)yA - 100, 460, (int)yA);
  paint(840, (int)yB - 100, 960, (int)yB);
  std::vector<avp::lon::Detection> dets{
      {340, yA - 100, 460, yA, 0.9, 1},
      {840, yB - 100, 960, yB, 0.95, 2}};
  const auto out = finder.update_and_get_cipo(dets, 4 * dt, frame.data());
  manual.predict(dt);
  manual.update(std::hypot(0.0, 0.1 * (double)(int)yA));
  if (!out.cipo.exists || out.cipo.class_id != 2 || out.cut_in_detected) {
    std::fprintf(stderr, "selftest: wrong CIPO switch state\n");
    return 1;
  }
  for (const auto& tr : finder.tracks()) {
    if (tr.class_id != 2) continue;
    if (tr.kalman.x[0] != manual.x[0] || tr.kalman.x[1] != manual.x[1]) {
      std::fprintf(stderr,
                   "selftest: transferred kalman is stale: got "
                   "(%.9f, %.9f) want (%.9f, %.9f)\n",
                   tr.kalman.x[0], tr.kalman.x[1], manual.x[0],
                   manual.x[1]);
      return 1;
    }
    std::printf("selftest-transfer: ok\n");
    return 0;
  }
  std::fprintf(stderr, "selftest: class-2 track missing\n");
  return 1;
}

int main(int argc, char** argv) {
  std::string dets_npy, hom_npy;
  int img_w = 1280, img_h = 720;
  // gain defaults = runtime/config.py LongitudinalConfig
  double dt = 0.1, ego = 10.0, kp = 0.5, ki = 0.1, kd = 0.05;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--selftest-transfer")) return selftest_transfer();
    if (!std::strcmp(argv[i], "--dets") && i + 1 < argc) dets_npy = argv[++i];
    else if (!std::strcmp(argv[i], "--hom") && i + 1 < argc) hom_npy = argv[++i];
    else if (!std::strcmp(argv[i], "--img-w") && i + 1 < argc) img_w = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--img-h") && i + 1 < argc) img_h = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--dt") && i + 1 < argc) dt = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--ego") && i + 1 < argc) ego = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--kp") && i + 1 < argc) kp = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--ki") && i + 1 < argc) ki = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--kd") && i + 1 < argc) kd = std::atof(argv[++i]);
  }
  if (dets_npy.empty() || hom_npy.empty()) {
    std::fprintf(stderr, "need --dets and --hom\n");
    return 2;
  }

  const avp::NpyArray dets = avp::read_npy_f32(dets_npy);
  const avp::NpyArray hom = avp::read_npy_f32(hom_npy);
  if (dets.shape.size() != 3 || dets.shape[2] != 7 || hom.size() != 9) {
    std::fprintf(stderr, "dets must be (T,D,7), hom must be 9 floats\n");
    return 2;
  }
  const long T = dets.shape[0], D = dets.shape[1];

  double H[9];
  for (int i = 0; i < 9; ++i) H[i] = hom.data[i];
  avp::lon::ObjectFinder finder(H, img_w, img_h);
  avp::lon::SpeedPlanner planner;
  avp::lon::PIController pid(kp, ki, kd);

  std::printf(
      "frame,exists,track_id,class_id,distance,velocity,cutin,reset,"
      "set_speed,safe_d,fcw,aeb,effort,n_tracks\n");
  for (long t = 0; t < T; ++t) {
    std::vector<avp::lon::Detection> frame_dets;
    for (long d = 0; d < D; ++d) {
      const float* row = dets.data.data() + (t * D + d) * 7;
      if (row[6] <= 0.5f) continue;  // valid flag from the device NMS
      frame_dets.push_back({row[0], row[1], row[2], row[3], row[4],
                            (int)row[5]});
    }
    const auto out = finder.update_and_get_cipo(frame_dets, t * dt);

    // wiring order matches runtime/pipeline.py:_harvest:369-387
    planner.set_ego_speed(ego);
    planner.set_is_cipo_present(out.cipo.exists);
    if (out.cipo.exists)
      planner.set_cipo_state(out.cipo.velocity_ms, out.cipo.distance_m);
    const double set_speed = planner.calc_ideal_driving_speed();
    if (out.cut_in_detected || out.kalman_reset) pid.reset();
    const double effort = pid.compute_effort(ego, set_speed);
    const double safe_d = planner.calc_safe_rss_distance();

    std::printf("%ld,%d,%d,%d,%.9f,%.9f,%d,%d,%.9f,%.9f,%d,%d,%.9f,%d\n",
                t, out.cipo.exists ? 1 : 0, out.cipo.track_id,
                out.cipo.class_id, out.cipo.distance_m, out.cipo.velocity_ms,
                out.cut_in_detected ? 1 : 0, out.kalman_reset ? 1 : 0,
                set_speed, safe_d, planner.fcw() ? 1 : 0,
                planner.aeb() ? 1 : 0, effort, out.num_tracks);
  }
  return 0;
}
