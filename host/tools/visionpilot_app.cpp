// visionpilot_app: Python-free production loop for the exported lateral
// pipeline step.
//
// TPU-native analog of the reference's deployable unit — a standalone
// native binary that captures frames, runs the perception/control stack
// and publishes control state over shared memory
// (VisionPilot/production_release/main.cpp:1543-1959). Here the whole
// per-frame lateral stack (preprocess -> EgoLanes -> temporal AutoSteer ->
// LaneFilter -> LaneTracker -> PathFinder -> steering) is ONE exported
// StableHLO program (export/native_app.py) and this binary is the loop:
//
//   frame source (frame_ring SHM or a .npy uint8 stack)
//     -> TF C API session run of the XlaCallModule graph
//     -> carried state tensors fed back into the next iteration
//     -> packed scalar vector published to /visionpilot_state (seqlock)
//
// No Python exists in this process. The carried state never leaves the
// runtime's buffers: each iteration's state_out_i TF_Tensor is fed
// directly as the next iteration's state_i input.
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
//       [--state-shm <seg>]        publish segment (default
//                                  /visionpilot_state)
//       [--dump <out.npy>]         write the FINAL iteration's out_0
//                                  (f32) — lets tests assert the whole
//                                  state-carried trajectory, not just
//                                  the first frame
//
// Exit 0 on success (and golden parity, if requested).

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "avp/frame_ring.hpp"
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

// SCALAR_FIELDS layout (runtime/pipeline.py:110-112): the packed lateral
// scalar vector out_0 = [steering_filtered, steering_raw, autosteer_deg,
// cte, yaw_error, lane_width, fused_valid, path_valid].
void publish_scalars(avp::host::SharedState& shm, const float* s, int n,
                     uint64_t frame_number) {
  avp::host::VisionPilotState st{};
  st.frame_number = frame_number;
  if (n >= 8) {
    st.steering_pid_deg = s[0];
    st.steering_pid_raw_deg = s[1];
    st.steering_autosteer_deg = s[2];
    st.cte_m = s[3];
    st.yaw_error_rad = s[4];
    st.autosteer_valid = s[6] > 0.5f;
    st.path_valid = s[7] > 0.5f;
    st.lane_departure_warning = st.path_valid && std::fabs(s[3]) > 0.9;
  }
  shm.publish(st);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <bundle_dir> <name> [--frames <stack.npy>] "
                 "[--ring <shm>] [--max-frames N] [--golden] "
                 "[--state-shm <seg>]\n",
                 argv[0]);
    return 2;
  }
  const std::string dir = argv[1];
  const std::string name = argv[2];
  std::string frames_npy, ring_name, dump_npy;
  std::string state_shm = "/visionpilot_state";
  long max_frames = -1;
  bool golden = false;
  for (int i = 3; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--frames") && i + 1 < argc)
      frames_npy = argv[++i];
    else if (!std::strcmp(argv[i], "--ring") && i + 1 < argc)
      ring_name = argv[++i];
    else if (!std::strcmp(argv[i], "--max-frames") && i + 1 < argc)
      max_frames = std::strtol(argv[++i], nullptr, 10);
    else if (!std::strcmp(argv[i], "--golden"))
      golden = true;
    else if (!std::strcmp(argv[i], "--state-shm") && i + 1 < argc)
      state_shm = argv[++i];
    else if (!std::strcmp(argv[i], "--dump") && i + 1 < argc)
      dump_npy = argv[++i];
  }

  const Manifest man = parse_manifest(dir + "/" + name + "_manifest.txt");
  const int64_t frame_bytes = man.frame_h * man.frame_w * man.frame_c;
  std::fprintf(stderr,
               "visionpilot_app: %s frame=%lldx%lldx%lld n_state=%d "
               "n_out=%d\n",
               man.graph_file.c_str(), (long long)man.frame_h,
               (long long)man.frame_w, (long long)man.frame_c, man.n_state,
               man.n_out);

  // --- graph + session ----------------------------------------------------
  const std::string pb = read_file(dir + "/" + man.graph_file);
  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
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

  std::vector<TF_Output> inputs{op("frame")};
  for (int i = 0; i < man.n_state; ++i)
    inputs.push_back(op("state_" + std::to_string(i)));
  std::vector<TF_Output> outputs;
  for (int j = 0; j < man.n_out; ++j)
    outputs.push_back(op("out_" + std::to_string(j)));
  for (int i = 0; i < man.n_state; ++i)
    outputs.push_back(op("state_out_" + std::to_string(i)));

  TF_SessionOptions* sopts = TF_NewSessionOptions();
  TF_Session* sess = TF_NewSession(graph, sopts, status);
  check(status, "create session");
  TF_DeleteSessionOptions(sopts);

  // --- initial state ------------------------------------------------------
  // keep the npy buffers alive for the whole run: iteration 0's input
  // tensors view them (no_dealloc).
  std::vector<avp::NpyArray> state0(man.n_state);
  std::vector<TF_Tensor*> state(man.n_state, nullptr);
  for (int i = 0; i < man.n_state; ++i) {
    state0[i] = avp::read_npy_f32(dir + "/" + name + "_state_" +
                                  std::to_string(i) + ".npy");
    state[i] = TF_NewTensor(TF_FLOAT, state0[i].shape.data(),
                            (int)state0[i].shape.size(),
                            state0[i].data.data(),
                            state0[i].data.size() * sizeof(float),
                            no_dealloc, nullptr);
  }

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

  const int64_t fshape[3] = {man.frame_h, man.frame_w, man.frame_c};
  std::vector<uint8_t> ring_buf(frame_bytes);
  avp::host::FrameHeader fh{};
  uint64_t last_seen = 0;
  bool golden_ok = true;
  long done = 0;
  double infer_s = 0.0;

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

    TF_Tensor* t_frame =
        TF_NewTensor(TF_UINT8, fshape, 3, fdata, (size_t)frame_bytes,
                     no_dealloc, nullptr);
    std::vector<TF_Tensor*> in_vals{t_frame};
    for (int i = 0; i < man.n_state; ++i) in_vals.push_back(state[i]);
    std::vector<TF_Tensor*> out_vals(outputs.size(), nullptr);

    auto t0 = std::chrono::steady_clock::now();
    TF_SessionRun(sess, nullptr, inputs.data(), in_vals.data(),
                  (int)inputs.size(), outputs.data(), out_vals.data(),
                  (int)outputs.size(), nullptr, 0, nullptr, status);
    check(status, "run session");
    infer_s += std::chrono::duration<double>(std::chrono::steady_clock::now()
                                             - t0).count();

    // state feedback: output tensors become next iteration's inputs
    TF_DeleteTensor(t_frame);
    for (int i = 0; i < man.n_state; ++i) {
      TF_DeleteTensor(state[i]);  // iteration-0 tensors only view state0
      state[i] = out_vals[man.n_out + i];
    }

    const float* scal = (const float*)TF_TensorData(out_vals[0]);
    const int n_scal = (int)TF_TensorElementCount(out_vals[0]);
    publish_scalars(shm, scal, n_scal, frame_number);
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
    for (int j = 0; j < man.n_out; ++j) TF_DeleteTensor(out_vals[j]);
    ++done;
    if (max_frames >= 0 && done >= max_frames + (golden ? 1 : 0)) break;
    if (max_frames < 0 && !ring && !(golden && it == 0) && n_stack == 0)
      break;
  }

  std::printf("visionpilot_app: %ld frames, %.2f ms/frame (%.1f FPS)\n",
              done, 1e3 * infer_s / std::max(done, 1L),
              done / std::max(infer_s, 1e-9));

  for (int i = 0; i < man.n_state; ++i)
    if (state[i]) TF_DeleteTensor(state[i]);
  TF_CloseSession(sess, status);
  TF_DeleteSession(sess, status);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  delete ring;
  return golden_ok ? 0 : 1;
}
