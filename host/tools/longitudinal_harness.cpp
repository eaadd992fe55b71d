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

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "avp/longitudinal.hpp"
#include "npy_io.hpp"

int main(int argc, char** argv) {
  std::string dets_npy, hom_npy;
  int img_w = 1280, img_h = 720;
  // gain defaults = runtime/config.py LongitudinalConfig
  double dt = 0.1, ego = 10.0, kp = 0.5, ki = 0.1, kd = 0.05;
  for (int i = 1; i < argc; ++i) {
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
