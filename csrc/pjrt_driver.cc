// mt_infer — native C++ host driver over the PJRT C API.
//
// Parity with the reference's standalone C++ TensorRT inference app
// (csrc/detect demo, /root/reference/docs/YOLO_TensorRT_Technical.md:232-286,
// debug target /root/reference/.vscode/launch.json:11-12): a self-contained
// binary that decodes an image, letterboxes it, runs the serialized detect
// graph on the accelerator, and prints detections — except the runtime is a
// PJRT plugin (libtpu.so on TPU hosts) executing the StableHLO module
// exported by `python -m yolov8_vit_tpu.runtime.export ... --stablehlo`.
//
// Usage:
//   mt_infer --plugin /path/libtpu.so --list-devices
//   mt_infer --plugin /path/libtpu.so --module detect.mlir
//            --compile-options detect.opts.pb --image street.jpg
//            [--imgsz 640] [--dump-prefix out]  (one command line)
//   mt_infer --plugin /opt/axon/libaxon_pjrt.so --axon ...   (tunnel TPU)
//
// Compiled-executable save/load (trtexec --saveEngine/--loadEngine parity,
// the native leg of the reference's deserializeCudaEngine workflow,
// /root/reference/docs/YOLO_TensorRT_Technical.md:228-230):
//   mt_infer ... --module detect.mlir --compile-options detect.opts.pb
//            --save-exec detect.pjrtexec        (compile once, save binary)
//   mt_infer ... --load-exec detect.pjrtexec --image street.jpg
//            (PJRT_Executable_DeserializeAndLoad: no MLIR parse, no XLA
//             compile — same artifact class as Engine's aot/*.jaxcomp)
//
// Build: make -C csrc mt_infer  (needs the pjrt_c_api.h include; see Makefile)

#include <dlfcn.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "imgproc.h"
#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

#define CHECK_PJRT(api, expr)                                       \
  do {                                                              \
    PJRT_Error* _err = (expr);                                      \
    if (_err) {                                                     \
      PJRT_Error_Message_Args _m;                                   \
      memset(&_m, 0, sizeof(_m));                                   \
      _m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;         \
      _m.error = _err;                                              \
      api->PJRT_Error_Message(&_m);                                 \
      fprintf(stderr, "PJRT error at %s:%d: %.*s\n", __FILE__,      \
              __LINE__, (int)_m.message_size, _m.message);          \
      PJRT_Error_Destroy_Args _d;                                   \
      memset(&_d, 0, sizeof(_d));                                   \
      _d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;         \
      _d.error = _err;                                              \
      api->PJRT_Error_Destroy(&_d);                                 \
      return 1;                                                     \
    }                                                               \
  } while (0)

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

struct Args {
  std::string plugin;
  std::string module_path;
  std::string compile_options_path;
  std::string image_path;
  std::string dump_prefix;
  std::string save_exec_path;
  std::string load_exec_path;
  int imgsz = 640;
  bool list_devices = false;
  // client create options as key=value (int if all-digits, else string);
  // e.g. the axon tunnel plugin requires topology/session_id/... NamedValues
  std::vector<std::string> options;
};

bool IsInt(const std::string& s) {
  if (s.empty()) return false;
  for (char c : s)
    if (!isdigit(static_cast<unsigned char>(c))) return false;
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  Args args;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string { return i + 1 < argc ? argv[++i] : ""; };
    if (a == "--plugin") args.plugin = next();
    else if (a == "--module") args.module_path = next();
    else if (a == "--compile-options") args.compile_options_path = next();
    else if (a == "--image") args.image_path = next();
    else if (a == "--imgsz") args.imgsz = atoi(next().c_str());
    else if (a == "--dump-prefix") args.dump_prefix = next();
    else if (a == "--save-exec") args.save_exec_path = next();
    else if (a == "--load-exec") args.load_exec_path = next();
    else if (a == "--list-devices") args.list_devices = true;
    else if (a == "--option") args.options.push_back(next());
    else if (a == "--axon") {
      // the tunnel plugin's required NamedValues (mirrors what
      // axon.register passes from python; session_id from /proc urandom)
      char sid[64];
      FILE* ur = fopen("/proc/sys/kernel/random/uuid", "r");
      if (ur && fgets(sid, sizeof(sid), ur)) {
        sid[strcspn(sid, "\n")] = 0;
      } else {
        snprintf(sid, sizeof(sid), "mtinfer-%d", (int)getpid());
      }
      if (ur) fclose(ur);
      const char* rc = getenv("PALLAS_AXON_REMOTE_COMPILE");
      args.options.push_back(std::string("remote_compile=") +
                             ((rc && rc[0] == '1') ? "1" : "0"));
      args.options.push_back("local_only=0");
      args.options.push_back("priority=0");
      const char* gen = getenv("PALLAS_AXON_TPU_GEN");
      args.options.push_back(std::string("topology=") +
                             (gen ? gen : "v5e") + ":1x1x1");
      args.options.push_back("n_slices=1");
      args.options.push_back(std::string("session_id=") + sid);
      args.options.push_back("rank=4294967295");
    }
    else { fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (args.plugin.empty()) {
    fprintf(stderr, "--plugin required\n");
    return 2;
  }

  void* handle = dlopen(args.plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "GetPjrtApi not found: %s\n", dlerror());
    return 1;
  }
  const PJRT_Api* api = get_api();
  printf("PJRT api version %d.%d\n", api->pjrt_api_version.major_version,
         api->pjrt_api_version.minor_version);

  // ---- plugin init + client ------------------------------------------------
  {
    PJRT_Plugin_Initialize_Args init;
    memset(&init, 0, sizeof(init));
    init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    CHECK_PJRT(api, api->PJRT_Plugin_Initialize(&init));
  }

  std::vector<PJRT_NamedValue> nvs;
  std::vector<std::string> keys, svals;   // stable storage for pointers
  std::vector<int64_t> ivals;
  keys.reserve(args.options.size());
  svals.reserve(args.options.size());
  ivals.reserve(args.options.size());
  for (const std::string& kv : args.options) {
    size_t eq = kv.find('=');
    if (eq == std::string::npos) {
      fprintf(stderr, "bad --option %s (want key=value)\n", kv.c_str());
      return 2;
    }
    keys.push_back(kv.substr(0, eq));
    std::string val = kv.substr(eq + 1);
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = keys.back().c_str();
    nv.name_size = keys.back().size();
    if (IsInt(val)) {
      ivals.push_back(strtoll(val.c_str(), nullptr, 10));
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = ivals.back();
    } else {
      svals.push_back(val);
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = svals.back().c_str();
      nv.value_size = svals.back().size();
    }
    nvs.push_back(nv);
  }

  PJRT_Client_Create_Args cc;
  memset(&cc, 0, sizeof(cc));
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = nvs.empty() ? nullptr : nvs.data();
  cc.num_options = nvs.size();
  CHECK_PJRT(api, api->PJRT_Client_Create(&cc));
  PJRT_Client* client = cc.client;

  {
    PJRT_Client_PlatformName_Args pn;
    memset(&pn, 0, sizeof(pn));
    pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
    pn.client = client;
    CHECK_PJRT(api, api->PJRT_Client_PlatformName(&pn));
    printf("platform: %.*s\n", (int)pn.platform_name_size, pn.platform_name);
  }

  PJRT_Client_AddressableDevices_Args ad;
  memset(&ad, 0, sizeof(ad));
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  CHECK_PJRT(api, api->PJRT_Client_AddressableDevices(&ad));
  printf("addressable devices: %zu\n", ad.num_addressable_devices);
  if (args.list_devices ||
      (args.module_path.empty() && args.load_exec_path.empty()))
    return 0;
  if (ad.num_addressable_devices == 0) {
    fprintf(stderr, "no devices\n");
    return 1;
  }

  PJRT_LoadedExecutable* exec = nullptr;
  if (!args.load_exec_path.empty()) {
    // ---- deserialize a previously saved compiled binary (no compile) ------
    std::string bytes = ReadFile(args.load_exec_path);
    if (bytes.empty()) {
      fprintf(stderr, "failed to read %s\n", args.load_exec_path.c_str());
      return 1;
    }
    PJRT_Executable_DeserializeAndLoad_Args dl;
    memset(&dl, 0, sizeof(dl));
    dl.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
    dl.client = client;
    dl.serialized_executable = bytes.data();
    dl.serialized_executable_size = bytes.size();
    CHECK_PJRT(api, api->PJRT_Executable_DeserializeAndLoad(&dl));
    exec = dl.loaded_executable;
    printf("deserialized %s (%zu bytes, no MLIR parse, no XLA compile)\n",
           args.load_exec_path.c_str(), bytes.size());
  } else {
    // ---- compile -----------------------------------------------------------
    std::string module = ReadFile(args.module_path);
    std::string copts = ReadFile(args.compile_options_path);
    if (module.empty() || copts.empty()) {
      fprintf(stderr, "failed to read module/compile options\n");
      return 1;
    }
    PJRT_Program prog;
    memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = module.data();
    prog.code_size = module.size();
    static const char kFmt[] = "mlir";
    prog.format = kFmt;
    prog.format_size = 4;

    PJRT_Client_Compile_Args comp;
    memset(&comp, 0, sizeof(comp));
    comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    comp.client = client;
    comp.program = &prog;
    comp.compile_options = copts.data();
    comp.compile_options_size = copts.size();
    CHECK_PJRT(api, api->PJRT_Client_Compile(&comp));
    exec = comp.executable;
    printf("compiled %s (%zu bytes mlir)\n", args.module_path.c_str(),
           module.size());
  }

  if (!args.save_exec_path.empty()) {
    // ---- save the compiled binary (trtexec --saveEngine parity) -----------
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    CHECK_PJRT(api, api->PJRT_LoadedExecutable_GetExecutable(&ge));
    PJRT_Executable_Serialize_Args se;
    memset(&se, 0, sizeof(se));
    se.struct_size = PJRT_Executable_Serialize_Args_STRUCT_SIZE;
    se.executable = ge.executable;
    CHECK_PJRT(api, api->PJRT_Executable_Serialize(&se));
    bool wrote_ok;
    {
      std::ofstream out(args.save_exec_path, std::ios::binary);
      out.write(se.serialized_bytes,
                static_cast<std::streamsize>(se.serialized_bytes_size));
      out.close();  // close before checking: the destructor's flush of
                    // buffered tail bytes can fail after a good() read
      wrote_ok = out.good();
    }
    if (se.serialized_executable_deleter)
      se.serialized_executable_deleter(se.serialized_executable);
    {
      PJRT_Executable_Destroy_Args ed;
      memset(&ed, 0, sizeof(ed));
      ed.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
      ed.executable = ge.executable;
      CHECK_PJRT(api, api->PJRT_Executable_Destroy(&ed));
    }
    if (!wrote_ok) {
      fprintf(stderr, "failed to write %s\n", args.save_exec_path.c_str());
      return 1;
    }
    printf("saved compiled executable -> %s (%zu bytes)\n",
           args.save_exec_path.c_str(), se.serialized_bytes_size);
  }

  // ---- input: decode + letterbox + blob -----------------------------------
  const int S = args.imgsz;
  std::vector<float> blob(size_t(S) * S * 3, 114.f / 255.f);
  mt::LetterboxInfo info;
  if (!args.image_path.empty()) {
    mt::Image img = mt::DecodeImageFile(args.image_path);
    if (!img.ok()) {
      fprintf(stderr, "decode failed: %s\n", args.image_path.c_str());
      return 1;
    }
    std::vector<uint8_t> lb(size_t(S) * S * 3);
    info = mt::LetterboxU8(img, S, S, 114, lb.data());
    for (size_t i = 0; i < lb.size(); ++i) blob[i] = lb[i] / 255.f;
    printf("letterbox ratio=%.4f dw=%.1f dh=%.1f\n", info.ratio, info.dw,
           info.dh);
    if (!args.dump_prefix.empty()) {
      std::ofstream out(args.dump_prefix + "_input.bin", std::ios::binary);
      out.write(reinterpret_cast<const char*>(blob.data()),
                blob.size() * sizeof(float));
    }
  }

  const int64_t dims[4] = {1, S, S, 3};  // NHWC, matching the exported graph
  PJRT_Client_BufferFromHostBuffer_Args bh;
  memset(&bh, 0, sizeof(bh));
  bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bh.client = client;
  bh.data = blob.data();
  bh.type = PJRT_Buffer_Type_F32;
  bh.dims = dims;
  bh.num_dims = 4;
  bh.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bh.device = ad.addressable_devices[0];
  CHECK_PJRT(api, api->PJRT_Client_BufferFromHostBuffer(&bh));
  {
    PJRT_Event_Await_Args aw;
    memset(&aw, 0, sizeof(aw));
    aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    aw.event = bh.done_with_host_buffer;
    CHECK_PJRT(api, api->PJRT_Event_Await(&aw));
    PJRT_Event_Destroy_Args ed;
    memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    ed.event = bh.done_with_host_buffer;
    api->PJRT_Event_Destroy(&ed);
  }
  PJRT_Buffer* input = bh.buffer;

  // ---- execute -------------------------------------------------------------
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    CHECK_PJRT(api, api->PJRT_LoadedExecutable_GetExecutable(&ge));
    no.executable = ge.executable;
    CHECK_PJRT(api, api->PJRT_Executable_NumOutputs(&no));
    PJRT_Executable_Destroy_Args ed;
    memset(&ed, 0, sizeof(ed));
    ed.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
    ed.executable = ge.executable;
    CHECK_PJRT(api, api->PJRT_Executable_Destroy(&ed));
  }
  size_t num_outputs = no.num_outputs;
  printf("executable outputs: %zu\n", num_outputs);

  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* arg_list[1] = {input};
  PJRT_Buffer* const* arg_lists[1] = {arg_list};
  std::vector<PJRT_Buffer*> out_buf(num_outputs, nullptr);
  PJRT_Buffer** out_lists[1] = {out_buf.data()};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args ex;
  memset(&ex, 0, sizeof(ex));
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &opts;
  ex.argument_lists = arg_lists;
  ex.num_devices = 1;
  ex.num_args = 1;
  ex.output_lists = out_lists;
  ex.device_complete_events = done;
  ex.execute_device = ad.addressable_devices[0];
  CHECK_PJRT(api, api->PJRT_LoadedExecutable_Execute(&ex));
  {
    PJRT_Event_Await_Args aw;
    memset(&aw, 0, sizeof(aw));
    aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    aw.event = done[0];
    CHECK_PJRT(api, api->PJRT_Event_Await(&aw));
  }

  // ---- fetch outputs -------------------------------------------------------
  for (size_t o = 0; o < num_outputs; ++o) {
    // request ROW-MAJOR host layout explicitly: without it the copy uses
    // the buffer's on-device layout, and outputs whose producing op ends
    // in a transpose arrive with a permuted minor_to_major (observed: the
    // (topk, 4) box tensor coming back column-major)
    PJRT_Buffer_Dimensions_Args bd;
    memset(&bd, 0, sizeof(bd));
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = out_buf[o];
    CHECK_PJRT(api, api->PJRT_Buffer_Dimensions(&bd));
    std::vector<int64_t> m2m(bd.num_dims);
    for (size_t d = 0; d < bd.num_dims; ++d)
      m2m[d] = (int64_t)(bd.num_dims - 1 - d);
    PJRT_Buffer_MemoryLayout layout;
    memset(&layout, 0, sizeof(layout));
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.minor_to_major = m2m.data();
    layout.tiled.minor_to_major_size = m2m.size();

    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_buf[o];
    th.host_layout = &layout;
    CHECK_PJRT(api, api->PJRT_Buffer_ToHostBuffer(&th));  // size query
    std::vector<uint8_t> host(th.dst_size);
    th.dst = host.data();
    CHECK_PJRT(api, api->PJRT_Buffer_ToHostBuffer(&th));
    {
      PJRT_Event_Await_Args aw;
      memset(&aw, 0, sizeof(aw));
      aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      aw.event = th.event;
      CHECK_PJRT(api, api->PJRT_Event_Await(&aw));
    }
    // print by the buffer's actual element type: the detect engine returns
    // (num_dets i32, bboxes f32, scores f32, labels i32), and reading the
    // int outputs as float shows denormal garbage ("2.8026e-45" for 2)
    PJRT_Buffer_ElementType_Args et;
    memset(&et, 0, sizeof(et));
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = out_buf[o];
    CHECK_PJRT(api, api->PJRT_Buffer_ElementType(&et));
    printf("output[%zu]: %zu bytes:", o, host.size());
    if (et.type == PJRT_Buffer_Type_S32 || et.type == PJRT_Buffer_Type_U32) {
      const int32_t* v = reinterpret_cast<const int32_t*>(host.data());
      for (size_t i = 0; i < host.size() / 4 && i < 8; ++i)
        printf(" %d", v[i]);
    } else {
      const float* f = reinterpret_cast<const float*>(host.data());
      for (size_t i = 0; i < host.size() / 4 && i < 8; ++i)
        printf(" %.4f", f[i]);
    }
    printf("\n");
    if (!args.dump_prefix.empty()) {
      std::ofstream out(args.dump_prefix + "_" + std::to_string(o) + ".bin",
                        std::ios::binary);
      out.write(reinterpret_cast<const char*>(host.data()), host.size());
    }
  }
  printf("OK\n");
  return 0;
}
