// Native (Python-free) StableHLO deploy harness over the PjRt C API.
//
// The TPU-native analog of the reference's native TensorRT deploy path
// (Models/exports/onnx_rt/main.cpp; VisionPilot tensorrt_engine.cpp):
// dlopens a PjRt plugin (libtpu.so on real TPU hosts, or any other PjRt
// C-API plugin), compiles the StableHLO module bytecode produced by
// tools/export_native_consumable.py, uploads the input tensor, executes,
// fetches the output and asserts parity against the JAX golden output.
// No Python in this process; the artifact is the contract.
//
// Usage:
//   pjrt_stablehlo_runner <plugin.so> <module.mlirbc> <input.npy>
//                         <golden.npy> [tol]
//
// Exits 0 iff max|out - golden| <= tol (default 2e-4).

#include <dlfcn.h>

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "npy_io.hpp"
#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  return std::string(std::istreambuf_iterator<char>(f), {});
}

void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::fprintf(stderr, "%s: %.*s\n", what,
               static_cast<int>(margs.message_size), margs.message);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  std::exit(2);
}

void await_event(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = event;
  check(g_api->PJRT_Event_Await(&aargs), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  check(g_api->PJRT_Event_Destroy(&dargs), "destroy event");
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <plugin.so> <module.mlirbc> <input.npy> "
                 "<golden.npy> [tol]\n",
                 argv[0]);
    return 2;
  }
  const float tol = argc > 5 ? std::strtof(argv[5], nullptr) : 2e-4f;

  void* lib = dlopen(argv[1], RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    std::fprintf(stderr, "dlopen %s failed: %s\n", argv[1], dlerror());
    return 2;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "%s does not export GetPjrtApi\n", argv[1]);
    return 2;
  }
  g_api = get_api();
  std::printf("PjRt C API v%d.%d from %s\n",
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version, argv[1]);

  if (g_api->PJRT_Plugin_Initialize) {
    PJRT_Plugin_Initialize_Args iargs;
    std::memset(&iargs, 0, sizeof(iargs));
    iargs.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    check(g_api->PJRT_Plugin_Initialize(&iargs), "plugin init");
  }

  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  check(g_api->PJRT_Client_Create(&cargs), "create client");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  devs.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&devs), "list devices");
  if (devs.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 2;
  }
  PJRT_Device* device = devs.addressable_devices[0];
  std::printf("%zu addressable device(s)\n", devs.num_addressable_devices);

  // compile the StableHLO module (empty CompileOptionsProto = defaults)
  std::string module = read_file(argv[2]);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = module.data();
  program.code_size = module.size();
  program.format = "mlir";
  program.format_size = 4;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = "";
  comp.compile_options_size = 0;
  check(g_api->PJRT_Client_Compile(&comp), "compile StableHLO");
  PJRT_LoadedExecutable* exe = comp.executable;
  std::printf("compiled %zu-byte module\n", module.size());

  // upload input
  avp::NpyArray input = avp::read_npy_f32(argv[3]);
  avp::NpyArray golden = avp::read_npy_f32(argv[4]);
  PJRT_Client_BufferFromHostBuffer_Args up;
  std::memset(&up, 0, sizeof(up));
  up.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  up.client = client;
  up.data = input.data.data();
  up.type = PJRT_Buffer_Type_F32;
  up.dims = input.shape.data();
  up.num_dims = input.shape.size();
  up.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  up.device = device;
  check(g_api->PJRT_Client_BufferFromHostBuffer(&up), "upload input");
  await_event(up.done_with_host_buffer, "await upload");

  // execute
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_Buffer* arg_list[] = {up.buffer};
  PJRT_Buffer* const* arg_lists[] = {arg_list};
  PJRT_Buffer* out_list[1] = {nullptr};
  PJRT_Buffer** out_lists[] = {out_list};
  PJRT_Event* done[1] = {nullptr};
  PJRT_LoadedExecutable_Execute_Args ex;
  std::memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exe;
  ex.options = &opts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_lists;
  ex.device_complete_events = done;
  check(g_api->PJRT_LoadedExecutable_Execute(&ex), "execute");
  await_event(done[0], "await execution");

  // fetch output
  PJRT_Buffer_ToHostBuffer_Args dl;
  std::memset(&dl, 0, sizeof(dl));
  dl.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  dl.src = out_list[0];
  check(g_api->PJRT_Buffer_ToHostBuffer(&dl), "query output size");
  std::vector<float> out(dl.dst_size / sizeof(float));
  dl.dst = out.data();
  check(g_api->PJRT_Buffer_ToHostBuffer(&dl), "fetch output");
  await_event(dl.event, "await fetch");

  if (static_cast<int64_t>(out.size()) != golden.size()) {
    std::fprintf(stderr, "output has %zu elements, golden has %lld\n",
                 out.size(), static_cast<long long>(golden.size()));
    return 1;
  }
  float max_diff = 0.f;
  for (size_t i = 0; i < out.size(); ++i)
    max_diff = std::fmax(max_diff, std::fabs(out[i] - golden.data[i]));
  std::printf("pjrt_stablehlo_runner: %zu elements, max|diff|=%g (tol %g)\n",
              out.size(), max_diff, tol);
  return max_diff <= tol ? 0 : 1;
}
