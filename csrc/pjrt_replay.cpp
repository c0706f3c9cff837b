// Standalone C++ deployment replay for exported StableHLO inference
// graphs over the PJRT C API.
//
// Counterpart of the reference's AOTInductor C++ inference binaries
// (examples/hstu/inference_aoti/cpp_inference/: load the exported .so,
// feed tensors, time the forward). The TPU-native deployment artifact is
// a StableHLO module (inference/export.py `export_ranking_dense`), and
// the portable C++ runtime is any PJRT plugin: this binary dlopens one
// (default: the baked TPU plugin), compiles the module, feeds the
// exported input spec, and replays the forward with latency percentiles
// — no Python anywhere in the serving process.
//
//   pjrt_replay --module dense_fwd.mlir --spec replay_spec.txt \
//               [--plugin /opt/axon/libaxon_pjrt.so] [--iters 32] \
//               [--opt-int remote_compile=1] [--opt-str topology=v5e:1x1x1]
//
// Spec format (one line per entry, written by export.py):
//   input <name> <dtype> <d0,d1,...>     dtype in {f32,bf16,f16,s32,s64,
//                                        u32,u8,s8,pred}; scalar = "-"
//   data <relative-path>                 optional raw blob: concatenated
//                                        row-major input payloads in
//                                        order; missing tail = zeros
// `--dry-run` parses + reports without touching the plugin (CI-safe).
//
// Build: make libpjrt_replay (csrc/Makefile); needs only the PJRT C API
// header and dlfcn — no protobuf, no XLA libs (the 6-byte
// CompileOptionsProto below is hand-encoded wire format).

#include <dlfcn.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct InputSpec {
  std::string name;
  std::string dtype;
  std::vector<int64_t> dims;
  size_t bytes = 0;
};

struct Spec {
  std::vector<InputSpec> inputs;
  std::string data_path;  // optional, relative to the spec file
};

int dtype_width(const std::string& d) {
  if (d == "f32" || d == "s32" || d == "u32") return 4;
  if (d == "bf16" || d == "f16" || d == "s16" || d == "u16") return 2;
  if (d == "s64" || d == "u64" || d == "f64") return 8;
  if (d == "u8" || d == "s8" || d == "pred") return 1;
  return -1;
}

PJRT_Buffer_Type dtype_pjrt(const std::string& d) {
  if (d == "f32") return PJRT_Buffer_Type_F32;
  if (d == "bf16") return PJRT_Buffer_Type_BF16;
  if (d == "f16") return PJRT_Buffer_Type_F16;
  if (d == "f64") return PJRT_Buffer_Type_F64;
  if (d == "s32") return PJRT_Buffer_Type_S32;
  if (d == "s64") return PJRT_Buffer_Type_S64;
  if (d == "s16") return PJRT_Buffer_Type_S16;
  if (d == "s8") return PJRT_Buffer_Type_S8;
  if (d == "u32") return PJRT_Buffer_Type_U32;
  if (d == "u64") return PJRT_Buffer_Type_U64;
  if (d == "u16") return PJRT_Buffer_Type_U16;
  if (d == "u8") return PJRT_Buffer_Type_U8;
  if (d == "pred") return PJRT_Buffer_Type_PRED;
  return PJRT_Buffer_Type_INVALID;
}

bool parse_spec(const std::string& path, Spec* out, std::string* err) {
  std::ifstream f(path);
  if (!f) {
    *err = "cannot open spec: " + path;
    return false;
  }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string kind;
    ss >> kind;
    if (kind == "data") {
      ss >> out->data_path;
    } else if (kind == "input") {
      InputSpec in;
      std::string dims;
      ss >> in.name >> in.dtype >> dims;
      if (in.dtype.empty()) {
        *err = "malformed input line: " + line;
        return false;
      }
      int w = dtype_width(in.dtype);
      if (w < 0) {
        *err = "unknown dtype '" + in.dtype + "' in: " + line;
        return false;
      }
      size_t n = 1;
      if (dims != "-" && !dims.empty()) {
        std::istringstream ds(dims);
        std::string tok;
        while (std::getline(ds, tok, ',')) {
          if (tok.empty()) continue;
          in.dims.push_back(std::stoll(tok));
          n *= static_cast<size_t>(in.dims.back());
        }
      }
      in.bytes = n * static_cast<size_t>(w);
      out->inputs.push_back(std::move(in));
    }
  }
  if (out->inputs.empty()) {
    *err = "spec has no inputs";
    return false;
  }
  return true;
}

uint64_t fnv1a(const void* data, size_t n) {
  const auto* p = static_cast<const uint8_t*>(data);
  uint64_t h = 1469598103934665603ull;
  for (size_t i = 0; i < n; ++i) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

// Minimal serialized xla.CompileOptionsProto: executable_build_options
// (field 3, message) = { num_replicas (field 4) = 1, num_partitions
// (field 5) = 1 }. Field numbers from xla/pjrt/proto/compile_options.proto.
const char kCompileOptions[] = {0x1a, 0x04, 0x20, 0x01, 0x28, 0x01};

struct Api {
  const PJRT_Api* api = nullptr;

  [[noreturn]] void fail(const char* where, PJRT_Error* e) const {
    PJRT_Error_Message_Args m;
    std::memset(&m, 0, sizeof(m));
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = e;
    api->PJRT_Error_Message(&m);
    std::fprintf(stderr, "pjrt_replay: %s failed: %.*s\n", where,
                 static_cast<int>(m.message_size), m.message);
    std::exit(2);
  }
  void check(const char* where, PJRT_Error* e) const {
    if (e != nullptr) fail(where, e);
  }
  void await_and_destroy(PJRT_Event* ev) const {
    if (ev == nullptr) return;
    PJRT_Event_Await_Args aw;
    std::memset(&aw, 0, sizeof(aw));
    aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    aw.event = ev;
    check("Event_Await", api->PJRT_Event_Await(&aw));
    PJRT_Event_Destroy_Args dd;
    std::memset(&dd, 0, sizeof(dd));
    dd.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    dd.event = ev;
    check("Event_Destroy", api->PJRT_Event_Destroy(&dd));
  }
};

void setenv_default(const char* k, const char* v) { setenv(k, v, 0); }

std::string gen_session_id() {
  std::random_device rd;
  std::mt19937_64 g(rd());
  char buf[64];
  std::snprintf(buf, sizeof(buf), "pjrt-replay-%016llx",
                static_cast<unsigned long long>(g()));
  return buf;
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  std::string module_path, spec_path;
  int iters = 16;
  bool dry_run = false;
  std::vector<std::pair<std::string, std::string>> opt_str;
  std::vector<std::pair<std::string, int64_t>> opt_int;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "missing value for %s\n", a.c_str());
        std::exit(1);
      }
      return argv[++i];
    };
    if (a == "--plugin") plugin = next();
    else if (a == "--module") module_path = next();
    else if (a == "--spec") spec_path = next();
    else if (a == "--iters") iters = std::max(1, std::stoi(next()));
    else if (a == "--dry-run") dry_run = true;
    else if (a == "--opt-str" || a == "--opt-int") {
      std::string kv = next();
      auto eq = kv.find('=');
      if (eq == std::string::npos) {
        std::fprintf(stderr, "bad option %s (want k=v)\n", kv.c_str());
        return 1;
      }
      if (a == "--opt-str")
        opt_str.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
      else
        opt_int.emplace_back(kv.substr(0, eq), std::stoll(kv.substr(eq + 1)));
    } else {
      std::fprintf(stderr, "unknown arg %s\n", a.c_str());
      return 1;
    }
  }
  if (module_path.empty() || spec_path.empty()) {
    std::fprintf(stderr,
                 "usage: pjrt_replay --module M.mlir --spec S.txt "
                 "[--plugin P.so] [--iters N] [--dry-run] "
                 "[--opt-str k=v] [--opt-int k=v]\n");
    return 1;
  }

  Spec spec;
  std::string err;
  if (!parse_spec(spec_path, &spec, &err)) {
    std::fprintf(stderr, "pjrt_replay: %s\n", err.c_str());
    return 1;
  }
  std::ifstream mf(module_path, std::ios::binary);
  if (!mf) {
    std::fprintf(stderr, "pjrt_replay: cannot open module %s\n",
                 module_path.c_str());
    return 1;
  }
  std::string module((std::istreambuf_iterator<char>(mf)),
                     std::istreambuf_iterator<char>());

  // host-side input payloads: optional data blob, zero-filled tail
  size_t total_bytes = 0;
  for (const auto& in : spec.inputs) total_bytes += in.bytes;
  std::vector<uint8_t> host(total_bytes, 0);
  if (!spec.data_path.empty()) {
    std::string dir = spec_path;
    auto slash = dir.find_last_of('/');
    dir = (slash == std::string::npos) ? "." : dir.substr(0, slash);
    std::ifstream df(dir + "/" + spec.data_path, std::ios::binary);
    if (df) df.read(reinterpret_cast<char*>(host.data()), host.size());
  }

  if (dry_run) {
    std::printf(
        "{\"mode\": \"dry-run\", \"inputs\": %zu, \"input_bytes\": %zu, "
        "\"module_bytes\": %zu}\n",
        spec.inputs.size(), total_bytes, module.size());
    return 0;
  }

  // env contract of the baked TPU plugin (axon sitecustomize parity);
  // no-ops for plugins that ignore them, never overrides the caller
  if (getenv("PALLAS_AXON_POOL_IPS") != nullptr) {
    setenv_default("AXON_POOL_SVC_OVERRIDE", "127.0.0.1");
    setenv_default("AXON_LOOPBACK_RELAY", "1");
  }
  setenv_default("AXON_COMPAT_VERSION", "49");
  setenv_default("TPU_SKIP_MDS_QUERY", "1");
  setenv_default("TPU_WORKER_HOSTNAMES", "localhost");

  void* h = dlopen(plugin.c_str(), RTLD_NOW | RTLD_GLOBAL);
  if (h == nullptr) {
    std::fprintf(stderr, "pjrt_replay: dlopen(%s): %s\n", plugin.c_str(),
                 dlerror());
    return 2;
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(dlsym(h, "GetPjrtApi"));
  if (get_api == nullptr) {
    std::fprintf(stderr, "pjrt_replay: no GetPjrtApi in %s\n",
                 plugin.c_str());
    return 2;
  }
  Api A;
  A.api = get_api();
  std::fprintf(stderr, "pjrt_replay: plugin api v%d.%d (header v%d.%d)\n",
               A.api->pjrt_api_version.major_version,
               A.api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
               PJRT_API_MINOR);

  {
    PJRT_Plugin_Initialize_Args pi;
    std::memset(&pi, 0, sizeof(pi));
    pi.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    A.check("Plugin_Initialize", A.api->PJRT_Plugin_Initialize(&pi));
  }

  // client create options: CLI overrides on top of the single-chip
  // remote-compile defaults the python registration uses
  auto has_opt = [&](const std::string& k) {
    for (auto& p : opt_str)
      if (p.first == k) return true;
    for (auto& p : opt_int)
      if (p.first == k) return true;
    return false;
  };
  std::string session = gen_session_id();
  if (!has_opt("remote_compile")) opt_int.emplace_back("remote_compile", 1);
  if (!has_opt("local_only")) opt_int.emplace_back("local_only", 0);
  if (!has_opt("priority")) opt_int.emplace_back("priority", 0);
  if (!has_opt("n_slices")) opt_int.emplace_back("n_slices", 1);
  if (!has_opt("rank")) opt_int.emplace_back("rank", 0xFFFFFFFFll);
  if (!has_opt("session_id")) opt_str.emplace_back("session_id", session);
  if (!has_opt("topology")) {
    const char* gen = getenv("PALLAS_AXON_TPU_GEN");
    opt_str.emplace_back(
        "topology", std::string(gen != nullptr ? gen : "v5e") + ":1x1x1");
  }
  std::vector<PJRT_NamedValue> nv;
  for (auto& p : opt_str) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = p.first.c_str();
    v.name_size = p.first.size();
    v.type = PJRT_NamedValue_kString;
    v.string_value = p.second.c_str();
    v.value_size = p.second.size();
    nv.push_back(v);
  }
  for (auto& p : opt_int) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof(v));
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = p.first.c_str();
    v.name_size = p.first.size();
    v.type = PJRT_NamedValue_kInt64;
    v.int64_value = p.second;
    v.value_size = 1;
  nv.push_back(v);
  }

  PJRT_Client* client = nullptr;
  {
    PJRT_Client_Create_Args cc;
    std::memset(&cc, 0, sizeof(cc));
    cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    cc.create_options = nv.data();
    cc.num_options = nv.size();
    A.check("Client_Create", A.api->PJRT_Client_Create(&cc));
    client = cc.client;
  }
  PJRT_Device* device = nullptr;
  {
    PJRT_Client_AddressableDevices_Args ad;
    std::memset(&ad, 0, sizeof(ad));
    ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    ad.client = client;
    A.check("AddressableDevices",
            A.api->PJRT_Client_AddressableDevices(&ad));
    if (ad.num_addressable_devices == 0) {
      std::fprintf(stderr, "pjrt_replay: no addressable devices\n");
      return 2;
    }
    device = ad.addressable_devices[0];
  }

  PJRT_LoadedExecutable* exec = nullptr;
  {
    PJRT_Program prog;
    std::memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = module.data();
    prog.code_size = module.size();
    prog.format = "mlir";
    prog.format_size = 4;
    PJRT_Client_Compile_Args co;
    std::memset(&co, 0, sizeof(co));
    co.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    co.client = client;
    co.program = &prog;
    co.compile_options = kCompileOptions;
    co.compile_options_size = sizeof(kCompileOptions);
    auto t0 = std::chrono::steady_clock::now();
    A.check("Client_Compile", A.api->PJRT_Client_Compile(&co));
    exec = co.executable;
    double compile_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();
    std::fprintf(stderr, "pjrt_replay: compiled in %.1fs\n", compile_s);
  }

  // upload inputs
  std::vector<PJRT_Buffer*> args;
  size_t off = 0;
  for (const auto& in : spec.inputs) {
    PJRT_Client_BufferFromHostBuffer_Args bb;
    std::memset(&bb, 0, sizeof(bb));
    bb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bb.client = client;
    bb.data = host.data() + off;
    bb.type = dtype_pjrt(in.dtype);
    bb.dims = in.dims.data();
    bb.num_dims = in.dims.size();
    bb.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
    bb.device = device;
    A.check("BufferFromHostBuffer",
            A.api->PJRT_Client_BufferFromHostBuffer(&bb));
    A.await_and_destroy(bb.done_with_host_buffer);
    args.push_back(bb.buffer);
    off += in.bytes;
  }

  size_t num_outputs = 0;
  {
    PJRT_LoadedExecutable_GetExecutable_Args ge;
    std::memset(&ge, 0, sizeof(ge));
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    A.check("GetExecutable",
            A.api->PJRT_LoadedExecutable_GetExecutable(&ge));
    PJRT_Executable_NumOutputs_Args no;
    std::memset(&no, 0, sizeof(no));
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no.executable = ge.executable;
    A.check("NumOutputs", A.api->PJRT_Executable_NumOutputs(&no));
    num_outputs = no.num_outputs;
  }

  std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
  PJRT_Buffer** out_list = outs.data();
  std::vector<double> times;
  auto run_once = [&]() {
    PJRT_ExecuteOptions eo;
    std::memset(&eo, 0, sizeof(eo));
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &eo;
    PJRT_Buffer* const* arg_list = args.data();
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = args.size();
    ex.output_lists = &out_list;
    PJRT_Event* done = nullptr;
    PJRT_Event** done_list = &done;
    ex.device_complete_events = done_list;
    A.check("Execute", A.api->PJRT_LoadedExecutable_Execute(&ex));
    A.await_and_destroy(done);
  };
  auto destroy_outputs = [&]() {
    for (auto*& b : outs) {
      if (b == nullptr) continue;
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = b;
      A.check("Buffer_Destroy", A.api->PJRT_Buffer_Destroy(&bd));
      b = nullptr;
    }
  };

  run_once();  // warmup (compile cache fill on some plugins)
  destroy_outputs();
  for (int i = 0; i < iters; ++i) {
    auto t0 = std::chrono::steady_clock::now();
    run_once();
    times.push_back(
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count());
    if (i + 1 < iters) destroy_outputs();
  }

  // fetch final outputs, checksum
  std::string out_json = "[";
  for (size_t i = 0; i < num_outputs; ++i) {
    PJRT_Buffer_ToHostBuffer_Args th;
    std::memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outs[i];
    A.check("ToHostBuffer(size)", A.api->PJRT_Buffer_ToHostBuffer(&th));
    std::vector<uint8_t> hostbuf(th.dst_size);
    th.dst = hostbuf.data();
    A.check("ToHostBuffer", A.api->PJRT_Buffer_ToHostBuffer(&th));
    A.await_and_destroy(th.event);
    char item[96];
    std::snprintf(item, sizeof(item),
                  "%s{\"bytes\": %zu, \"fnv1a\": \"%016llx\"}",
                  i != 0u ? ", " : "", hostbuf.size(),
                  static_cast<unsigned long long>(
                      fnv1a(hostbuf.data(), hostbuf.size())));
    out_json += item;
  }
  out_json += "]";
  destroy_outputs();

  std::sort(times.begin(), times.end());
  auto pct = [&](double p) {
    return times[std::min(times.size() - 1,
                          static_cast<size_t>(p * times.size()))] * 1e3;
  };
  std::printf(
      "{\"bench\": \"pjrt_replay\", \"iters\": %d, "
      "\"latency_ms_p10\": %.3f, \"latency_ms_p50\": %.3f, "
      "\"latency_ms_p90\": %.3f, \"num_inputs\": %zu, "
      "\"input_bytes\": %zu, \"outputs\": %s}\n",
      iters, pct(0.10), pct(0.50), pct(0.90), spec.inputs.size(),
      total_bytes, out_json.c_str());
  return 0;
}
