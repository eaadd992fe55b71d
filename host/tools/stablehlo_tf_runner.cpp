// Native (Python-free) consumer of the exported StableHLO artifact.
//
// TPU-native analog of the reference's C++ deploy examples
// (Models/exports/onnx_rt/main.cpp, Models/exports/libtorch/main.cpp):
// where the reference proves its ONNX/TorchScript export contract by
// running the artifact from C++, this proves the jax.export StableHLO
// contract. The artifact (produced by tools/export_native_consumable.py)
// is a TF GraphDef whose single compute node is XlaCallModule carrying
// the serialized StableHLO module; the TensorFlow C API JIT-compiles and
// executes it with XLA — no Python anywhere in this process.
//
// Usage:
//   stablehlo_tf_runner <graph.pb> <io.txt> <input.npy> <golden.npy> [tol]
//
// Exits 0 iff max|out - golden| <= tol (default 2e-4).

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

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

void dealloc(void*, size_t, void*) {}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <graph.pb> <io.txt> <input.npy> <golden.npy> "
                 "[tol]\n",
                 argv[0]);
    return 2;
  }
  const std::string pb = read_file(argv[1]);
  std::ifstream io(argv[2]);
  std::string in_name, out_name;
  io >> in_name >> out_name;
  avp::NpyArray input = avp::read_npy_f32(argv[3]);
  avp::NpyArray golden = avp::read_npy_f32(argv[4]);
  const float tol = argc > 5 ? std::strtof(argv[5], nullptr) : 2e-4f;

  TF_Status* status = TF_NewStatus();
  TF_Graph* graph = TF_NewGraph();
  TF_Buffer* gbuf = TF_NewBufferFromString(pb.data(), pb.size());
  TF_ImportGraphDefOptions* iopts = TF_NewImportGraphDefOptions();
  TF_GraphImportGraphDef(graph, gbuf, iopts, status);
  check(status, "import GraphDef");
  TF_DeleteImportGraphDefOptions(iopts);
  TF_DeleteBuffer(gbuf);

  TF_Operation* in_op = TF_GraphOperationByName(graph, in_name.c_str());
  TF_Operation* out_op = TF_GraphOperationByName(graph, out_name.c_str());
  if (!in_op || !out_op) {
    std::fprintf(stderr, "graph is missing op %s or %s\n", in_name.c_str(),
                 out_name.c_str());
    return 2;
  }
  TF_Output in{in_op, 0}, out{out_op, 0};

  TF_SessionOptions* sopts = TF_NewSessionOptions();
  TF_Session* sess = TF_NewSession(graph, sopts, status);
  check(status, "create session");
  TF_DeleteSessionOptions(sopts);

  TF_Tensor* t_in = TF_NewTensor(
      TF_FLOAT, input.shape.data(), static_cast<int>(input.shape.size()),
      input.data.data(), input.data.size() * sizeof(float), dealloc,
      nullptr);
  TF_Tensor* t_out = nullptr;
  TF_SessionRun(sess, /*run_options=*/nullptr, &in, &t_in, 1, &out, &t_out,
                1, /*targets=*/nullptr, 0, /*metadata=*/nullptr, status);
  check(status, "run session");

  const auto n = static_cast<int64_t>(TF_TensorElementCount(t_out));
  if (n != golden.size()) {
    std::fprintf(stderr, "output has %lld elements, golden has %lld\n",
                 static_cast<long long>(n),
                 static_cast<long long>(golden.size()));
    return 1;
  }
  const float* y = static_cast<const float*>(TF_TensorData(t_out));
  float max_diff = 0.f;
  for (int64_t i = 0; i < n; ++i)
    max_diff = std::fmax(max_diff, std::fabs(y[i] - golden.data[i]));

  std::printf("stablehlo_tf_runner: %lld elements, max|diff|=%g (tol %g)\n",
              static_cast<long long>(n), max_diff, tol);

  TF_DeleteTensor(t_in);
  TF_DeleteTensor(t_out);
  TF_CloseSession(sess, status);
  TF_DeleteSession(sess, status);
  TF_DeleteGraph(graph);
  TF_DeleteStatus(status);
  return max_diff <= tol ? 0 : 1;
}
