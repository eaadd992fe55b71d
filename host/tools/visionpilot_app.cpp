// visionpilot_app: Python-free production loop for the exported
// pipeline steps.
//
// TPU-native analog of the reference's deployable unit — a standalone
// native binary that captures frames, runs the perception/control stack
// and publishes control state over shared memory
// (VisionPilot/production_release/main.cpp:1543-1959). The per-frame
// lateral stack (preprocess -> EgoLanes -> temporal AutoSteer ->
// LaneFilter -> LaneTracker -> PathFinder -> steering) is ONE exported
// StableHLO program (export/native_app.py); with --lon the AutoSpeed
// detection program (letterbox -> net -> decode -> fixed NMS) runs in
// the same process and its (max_det, 7) table feeds the native
// longitudinal stack (avp/longitudinal.hpp: ObjectFinder -> RSS ->
// PI, the main.cpp:662-785 path) — zero Python anywhere.
//
//   frame source (frame_ring SHM or a .npy uint8 stack)
//     -> TF C API run of the lateral XlaCallModule graph
//        (carried state tensors fed back into the next iteration)
//     -> [--lon] TF C API run of the detection graph
//        -> ObjectFinder/Kalman -> SpeedPlanner -> PIController
//     -> full VisionPilotState POD published to /visionpilot_state
//
// Usage:
//   visionpilot_app <bundle_dir> <name>
//       [--frames <stack.npy>]     uint8 (N,H,W,C) frame stack source
//       [--ring <shm_name>]        frame_ring SHM source (live capture)
//       [--max-frames N]           stop after N frames (default: stack
//                                  length, or 0 = run forever for --ring)
//       [--golden]                 run <name>_probe_frame.npy first and
//                                  verify out_0 against
//                                  <name>_probe_scalars.npy (tol 2e-3)
//       [--lon <name2>]            also run the <name2> detection bundle
//                                  from the same dir + the native
//                                  longitudinal stack
//       [--can <iface|log.asc>]    ego speed/steering from SocketCAN or
//                                  a Vector .asc replay (0xA1 speed,
//                                  0xA4 steering; reference
//                                  can_interface.cpp contract)
//       [--ego-speed V]            fallback ego speed m/s for RSS/PID
//                                  while CAN is absent/invalid (default
//                                  10.0 = ego_speed_default_ms)
//       [--state-shm <seg>]        publish segment (default
//                                  /visionpilot_state)
//       [--dump <out.npy>]         write the FINAL iteration's out_0
//                                  (f32) — lets tests assert the whole
//                                  state-carried trajectory, not just
//                                  the first frame
//
// Exit 0 on success (and golden parity, if requested).

#include <chrono>
#include <thread>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "avp/can_reader.hpp"
#include "avp/frame_ring.hpp"
#include "avp/longitudinal.hpp"
#include "avp/shared_state.hpp"
#include "npy_io.hpp"
#include "tensorflow/c/c_api.h"

namespace {

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  return std::string(std::istreambuf_iterator<char>(f), {});
}

void check(TF_Status* s, const char* what) {
  if (TF_GetCode(s) != TF_OK) {
    std::fprintf(stderr, "%s: %s\n", what, TF_Message(s));
    std::exit(2);
  }
}

void no_dealloc(void*, size_t, void*) {}

struct Manifest {
  std::string graph_file;
  int64_t frame_h = 0, frame_w = 0, frame_c = 0;
  int n_state = 0, n_out = 0;
};

Manifest parse_manifest(const std::string& path) {
  std::ifstream f(path);
  if (!f) {
    std::fprintf(stderr, "cannot open manifest %s\n", path.c_str());
    std::exit(2);
  }
  Manifest m;
  std::string key;
  while (f >> key) {
    if (key == "graph") {
      f >> m.graph_file;
    } else if (key == "frame") {
      f >> m.frame_h >> m.frame_w >> m.frame_c;
    } else if (key == "n_state") {
      f >> m.n_state;
    } else if (key == "n_out") {
      f >> m.n_out;
    } else {  // "out i rank dims..." — shapes come back from TF, skip
      std::string rest;
      std::getline(f, rest);
    }
  }
  return m;
}

// One exported XlaCallModule bundle: graph + session + carried state.
// run() feeds the frame (and current state), returns the out_j tensors
// and retires state_out_i into the next iteration's inputs.
struct Program {
  Manifest man;
  TF_Graph* graph = nullptr;
  TF_Session* sess = nullptr;
  TF_Status* status = nullptr;
  std::vector<TF_Output> inputs, outputs;
  std::vector<avp::NpyArray> state0;
  std::vector<TF_Tensor*> state;

  void load(const std::string& dir, const std::string& name) {
    man = parse_manifest(dir + "/" + name + "_manifest.txt");
    const std::string pb = read_file(dir + "/" + man.graph_file);
    status = TF_NewStatus();
    graph = TF_NewGraph();
    TF_Buffer* gbuf = TF_NewBufferFromString(pb.data(), pb.size());
    TF_ImportGraphDefOptions* iopts = TF_NewImportGraphDefOptions();
    TF_GraphImportGraphDef(graph, gbuf, iopts, status);
    check(status, "import GraphDef");
    TF_DeleteImportGraphDefOptions(iopts);
    TF_DeleteBuffer(gbuf);

    auto op = [&](const std::string& n) -> TF_Output {
      TF_Operation* o = TF_GraphOperationByName(graph, n.c_str());
      if (!o) {
        std::fprintf(stderr, "graph is missing op %s\n", n.c_str());
        std::exit(2);
      }
      return TF_Output{o, 0};
    };
    inputs.push_back(op("frame"));
    for (int i = 0; i < man.n_state; ++i)
      inputs.push_back(op("state_" + std::to_string(i)));
    for (int j = 0; j < man.n_out; ++j)
      outputs.push_back(op("out_" + std::to_string(j)));
    for (int i = 0; i < man.n_state; ++i)
      outputs.push_back(op("state_out_" + std::to_string(i)));

    TF_SessionOptions* sopts = TF_NewSessionOptions();
    sess = TF_NewSession(graph, sopts, status);
    check(status, "create session");
    TF_DeleteSessionOptions(sopts);

    // keep the npy buffers alive for the whole run: iteration 0's input
    // tensors view them (no_dealloc).
    state0.resize(man.n_state);
    state.assign(man.n_state, nullptr);
    for (int i = 0; i < man.n_state; ++i) {
      state0[i] = avp::read_npy_f32(dir + "/" + name + "_state_" +
                                    std::to_string(i) + ".npy");
      state[i] = TF_NewTensor(TF_FLOAT, state0[i].shape.data(),
                              (int)state0[i].shape.size(),
                              state0[i].data.data(),
                              state0[i].data.size() * sizeof(float),
                              no_dealloc, nullptr);
    }
  }

  // Returns the out_j tensors (caller deletes); state feedback is done.
  std::vector<TF_Tensor*> run(const uint8_t* fdata) {
    const int64_t fshape[3] = {man.frame_h, man.frame_w, man.frame_c};
    TF_Tensor* t_frame = TF_NewTensor(
        TF_UINT8, fshape, 3, (void*)fdata,
        (size_t)(man.frame_h * man.frame_w * man.frame_c), no_dealloc,
        nullptr);
    std::vector<TF_Tensor*> in_vals{t_frame};
    for (int i = 0; i < man.n_state; ++i) in_vals.push_back(state[i]);
    std::vector<TF_Tensor*> out_vals(outputs.size(), nullptr);
    TF_SessionRun(sess, nullptr, inputs.data(), in_vals.data(),
                  (int)inputs.size(), outputs.data(), out_vals.data(),
                  (int)outputs.size(), nullptr, 0, nullptr, status);
    check(status, "run session");
    TF_DeleteTensor(t_frame);
    for (int i = 0; i < man.n_state; ++i) {
      TF_DeleteTensor(state[i]);  // iteration-0 tensors only view state0
      state[i] = out_vals[man.n_out + i];
    }
    out_vals.resize(man.n_out);
    return out_vals;
  }

  void unload() {
    for (TF_Tensor*& t : state)
      if (t) TF_DeleteTensor(t);
    if (sess) {
      TF_CloseSession(sess, status);
      TF_DeleteSession(sess, status);
    }
    if (graph) TF_DeleteGraph(graph);
    if (status) TF_DeleteStatus(status);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <bundle_dir> <name> [--frames <stack.npy>] "
                 "[--ring <shm>] [--max-frames N] [--golden] "
                 "[--lon <name2>] [--ego-speed V] [--state-shm <seg>]\n",
                 argv[0]);
    return 2;
  }
  const std::string dir = argv[1];
  const std::string name = argv[2];
  std::string frames_npy, ring_name, dump_npy, lon_name, can_src;
  std::string state_shm = "/visionpilot_state";
  long max_frames = -1;
  bool golden = false;
  double ego_speed = 10.0;  // ego_speed_default_ms (runtime/config.py)
  for (int i = 3; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--frames") && i + 1 < argc)
      frames_npy = argv[++i];
    else if (!std::strcmp(argv[i], "--ring") && i + 1 < argc)
      ring_name = argv[++i];
    else if (!std::strcmp(argv[i], "--max-frames") && i + 1 < argc)
      max_frames = std::strtol(argv[++i], nullptr, 10);
    else if (!std::strcmp(argv[i], "--golden"))
      golden = true;
    else if (!std::strcmp(argv[i], "--lon") && i + 1 < argc)
      lon_name = argv[++i];
    else if (!std::strcmp(argv[i], "--can") && i + 1 < argc)
      can_src = argv[++i];
    else if (!std::strcmp(argv[i], "--ego-speed") && i + 1 < argc)
      ego_speed = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--state-shm") && i + 1 < argc)
      state_shm = argv[++i];
    else if (!std::strcmp(argv[i], "--dump") && i + 1 < argc)
      dump_npy = argv[++i];
  }

  Program lat;
  lat.load(dir, name);
  const Manifest& man = lat.man;
  const int64_t frame_bytes = man.frame_h * man.frame_w * man.frame_c;
  std::fprintf(stderr,
               "visionpilot_app: %s frame=%lldx%lldx%lld n_state=%d "
               "n_out=%d%s\n",
               man.graph_file.c_str(), (long long)man.frame_h,
               (long long)man.frame_w, (long long)man.frame_c, man.n_state,
               man.n_out, lon_name.empty() ? "" : " +longitudinal");

  Program lon;
  const bool with_lon = !lon_name.empty();
  if (with_lon) {
    lon.load(dir, lon_name);
    // both programs consume the SAME frame buffer: a dim mismatch would
    // be an out-of-bounds read, not a smaller inference — refuse early
    if (lon.man.frame_h != man.frame_h || lon.man.frame_w != man.frame_w ||
        lon.man.frame_c != man.frame_c) {
      std::fprintf(stderr,
                   "--lon bundle frame dims (%lldx%lldx%lld) do not match "
                   "the lateral bundle's (%lldx%lldx%lld)\n",
                   (long long)lon.man.frame_h, (long long)lon.man.frame_w,
                   (long long)lon.man.frame_c, (long long)man.frame_h,
                   (long long)man.frame_w, (long long)man.frame_c);
      return 2;
    }
  }

  // native longitudinal stack (reference main.cpp:662-785); flat-ground
  // homography placeholder — production passes a calibrated one via the
  // exported bundle's metadata or a sidecar (calibration/).
  const double hom[9] = {0.02, 0.0, -12.8, 0.0, -0.09, 72.0,
                         0.0, 0.001, 0.28};
  avp::lon::ObjectFinder finder(hom, (int)man.frame_w, (int)man.frame_h);
  avp::lon::SpeedPlanner planner;
  avp::lon::PIController pid(0.5, 0.1, 0.05);  // LongitudinalConfig gains
  avp::can::CanReader* can = nullptr;
  if (!can_src.empty()) can = new avp::can::CanReader(can_src);

  // --- frame source -------------------------------------------------------
  avp::NpyArrayU8 stack;
  avp::host::FrameRing* ring = nullptr;
  long n_stack = 0;
  if (!frames_npy.empty()) {
    stack = avp::read_npy_u8(frames_npy);
    if ((int)stack.shape.size() != 4 || stack.shape[1] != man.frame_h ||
        stack.shape[2] != man.frame_w || stack.shape[3] != man.frame_c) {
      std::fprintf(stderr, "frame stack shape mismatch vs manifest\n");
      return 2;
    }
    n_stack = stack.shape[0];
    if (max_frames < 0) max_frames = n_stack;
  } else if (!ring_name.empty()) {
    ring = new avp::host::FrameRing(ring_name.c_str(), /*owner=*/false);
    if (!ring->ok()) {
      std::fprintf(stderr, "cannot attach frame ring %s\n",
                   ring_name.c_str());
      return 2;
    }
  } else if (!golden) {
    std::fprintf(stderr, "need --frames, --ring or --golden\n");
    return 2;
  }

  avp::NpyArrayU8 probe;
  avp::NpyArray probe_scalars;
  if (golden) {
    probe = avp::read_npy_u8(dir + "/" + name + "_probe_frame.npy");
    probe_scalars =
        avp::read_npy_f32(dir + "/" + name + "_probe_scalars.npy");
  }

  avp::host::SharedState shm(state_shm.c_str(), /*owner=*/true);
  if (!shm.ok()) {
    std::fprintf(stderr, "cannot create %s\n", state_shm.c_str());
    return 2;
  }

  std::vector<uint8_t> ring_buf(frame_bytes);
  avp::host::FrameHeader fh{};
  uint64_t last_seen = 0;
  bool golden_ok = true;
  long done = 0;
  double infer_s = 0.0;
  const auto wall0 = std::chrono::steady_clock::now();

  for (long it = 0;; ++it) {
    // golden probe runs as iteration 0 from the exporter's fixed state,
    // exactly reproducing the Python-side first step.
    uint8_t* fdata = nullptr;
    uint64_t frame_number = (uint64_t)it + 1;
    if (golden && it == 0) {
      fdata = probe.data.data();
    } else if (n_stack > 0) {
      long idx = (golden ? it - 1 : it) % n_stack;  // probe was it==0
      fdata = stack.data.data() + idx * frame_bytes;
    } else if (ring) {
      while (!ring->read_latest(ring_buf.data(), (uint32_t)frame_bytes, &fh,
                                last_seen)) {
        // producer-paced: spin-wait for a fresh frame
      }
      last_seen = fh.frame_number;
      frame_number = fh.frame_number;
      fdata = ring_buf.data();
    } else {
      break;  // --golden only: single probe iteration
    }

    auto t0 = std::chrono::steady_clock::now();
    // the two programs are independent consumers of the same frame:
    // dispatch the detector on a second thread and overlap it with the
    // lateral program (distinct TF_Sessions are thread-safe to run
    // concurrently)
    std::vector<TF_Tensor*> lon_out;
    std::thread lon_thread;
    if (with_lon)
      lon_thread = std::thread([&] { lon_out = lon.run(fdata); });
    std::vector<TF_Tensor*> lat_out = lat.run(fdata);
    if (lon_thread.joinable()) lon_thread.join();
    infer_s += std::chrono::duration<double>(std::chrono::steady_clock::now()
                                             - t0).count();

    // --- publish the full state POD ---------------------------------------
    avp::host::VisionPilotState st{};
    st.frame_number = frame_number;

    // SCALAR_FIELDS layout (runtime/pipeline.py:110-112): out_0 =
    // [steering_filtered, steering_raw, autosteer_deg, cte, yaw_error,
    //  lane_width, fused_valid, path_valid].
    const float* scal = (const float*)TF_TensorData(lat_out[0]);
    const int n_scal = (int)TF_TensorElementCount(lat_out[0]);
    if (n_scal >= 8) {
      st.steering_pid_deg = scal[0];
      st.steering_pid_raw_deg = scal[1];
      st.steering_autosteer_deg = scal[2];
      st.cte_m = scal[3];
      st.yaw_error_rad = scal[4];
      st.autosteer_valid = scal[6] > 0.5f;
      st.path_valid = scal[7] > 0.5f;
      st.lane_departure_warning = st.path_valid && std::fabs(scal[3]) > 0.9;
    }

    // CAN poll once per captured frame (main.cpp:427-432); graceful
    // degradation: invalid CAN keeps the fallback ego speed.
    double ego_now = ego_speed;
    if (can != nullptr) {
      const double now_can = std::chrono::duration<double>(
          std::chrono::steady_clock::now() - wall0).count();
      const auto& cs = can->update(now_can);
      st.can_valid = cs.valid;
      st.ego_steering_angle_deg =
          std::isnan(cs.steering_angle_deg) ? 0.0 : cs.steering_angle_deg;
      if (cs.valid) ego_now = cs.speed_ms;
      st.ego_speed_ms = ego_now;
    }

    if (with_lon) {
      // detection table (max_det, 7): x1,y1,x2,y2,score,class,valid
      const float* tab = (const float*)TF_TensorData(lon_out[0]);
      const int64_t rows = TF_Dim(lon_out[0], 0);
      std::vector<avp::lon::Detection> dets;
      for (int64_t r = 0; r < rows; ++r) {
        const float* row = tab + r * 7;
        if (row[6] > 0.5f)
          dets.push_back({row[0], row[1], row[2], row[3], row[4],
                          (int)row[5]});
      }
      const double now = std::chrono::duration<double>(
          std::chrono::steady_clock::now() - wall0).count();
      const auto trk = finder.update_and_get_cipo(dets, now, fdata);

      // wiring order matches runtime/pipeline.py:_harvest:369-387
      planner.set_ego_speed(ego_now);
      planner.set_is_cipo_present(trk.cipo.exists);
      if (trk.cipo.exists)
        planner.set_cipo_state(trk.cipo.velocity_ms, trk.cipo.distance_m);
      const double set_speed = planner.calc_ideal_driving_speed();
      if (trk.cut_in_detected || trk.kalman_reset) pid.reset();
      const double effort = pid.compute_effort(ego_now, set_speed);

      st.cipo_exists = trk.cipo.exists;
      st.cipo_track_id = trk.cipo.track_id;
      st.cipo_class_id = trk.cipo.class_id;
      st.cipo_distance_m = trk.cipo.distance_m;
      st.cipo_velocity_ms = trk.cipo.velocity_ms;
      st.cut_in_detected = trk.cut_in_detected;
      st.kalman_reset = trk.kalman_reset;
      st.ideal_speed_ms = set_speed;
      st.safe_distance_m = planner.calc_safe_rss_distance();
      st.fcw_active = planner.fcw();
      st.aeb_active = planner.aeb();
      st.control_effort_ms2 = effort;
      st.ego_speed_ms = ego_now;
    }
    shm.publish(st);

    if (!dump_npy.empty()) {
      avp::NpyArray a;
      a.shape = {n_scal};
      a.data.assign(scal, scal + n_scal);
      avp::write_npy_f32(dump_npy, a);  // last write wins: final out_0
    }

    if (golden && it == 0) {
      float max_diff = 0.f;
      for (int64_t k = 0; k < probe_scalars.size() && k < n_scal; ++k)
        max_diff =
            std::fmax(max_diff, std::fabs(scal[k] - probe_scalars.data[k]));
      std::fprintf(stderr, "golden probe: max|diff|=%g (tol 2e-3)\n",
                   max_diff);
      golden_ok = max_diff <= 2e-3f;
    }
    for (TF_Tensor* t : lat_out) TF_DeleteTensor(t);
    for (TF_Tensor* t : lon_out) TF_DeleteTensor(t);
    ++done;
    if (max_frames >= 0 && done >= max_frames + (golden ? 1 : 0)) break;
    if (max_frames < 0 && !ring && !(golden && it == 0) && n_stack == 0)
      break;
  }

  std::printf("visionpilot_app: %ld frames, %.2f ms/frame (%.1f FPS)\n",
              done, 1e3 * infer_s / std::max(done, 1L),
              done / std::max(infer_s, 1e-9));

  lat.unload();
  if (with_lon) lon.unload();
  delete can;
  delete ring;
  return golden_ok ? 0 : 1;
}
