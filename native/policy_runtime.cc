// On-robot policy runtime: loads the exported JSON policy and runs the
// dense forward pass. This is the native consumer of the deployment ABI
// (puppax/export/params.py, mirroring /root/reference/pupperv3_mjx/
// export.py:13-81): layers of {dense, activation, weights=[kernel, bias]}
// applied in order, kernel layout (in, out) so y = x^T K + b.
//
// Built as a shared library with a C API so both the robot loop and the
// Python round-trip tests (ctypes) can drive it:
//   puppax_policy* puppax_policy_load(const char* path);
//   int  puppax_policy_in_dim(const puppax_policy*);
//   int  puppax_policy_out_dim(const puppax_policy*);
//   int  puppax_policy_infer(const puppax_policy*, const float* obs,
//                            float* out);  // returns 0 on success
//   int  puppax_policy_gait_enabled(const puppax_policy*);
//   double puppax_policy_gait_frequency(const puppax_policy*);
//   void puppax_policy_reset_clock(puppax_policy*);
//   int  puppax_policy_infer_clocked(puppax_policy*, const float* obs,
//                                    float* out);  // appends gait clock
//   void puppax_policy_free(puppax_policy*);
//
// The JSON subset parsed here is exactly what convert_params emits:
// objects, arrays, strings, numbers, booleans, null. No external deps.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------- minimal JSON parser (ABI-subset) ----------------------
struct JsonValue {
  enum Kind { kNull, kBool, kNumber, kString, kArray, kObject } kind = kNull;
  bool boolean = false;
  double number = 0.0;
  std::string str;
  std::vector<JsonValue> array;
  std::vector<std::pair<std::string, JsonValue>> object;

  const JsonValue* find(const std::string& key) const {
    for (const auto& kv : object)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
};

class JsonParser {
 public:
  explicit JsonParser(const char* text) : p_(text) {}

  bool Parse(JsonValue* out) { return ParseValue(out) && (SkipWs(), *p_ == '\0'); }

 private:
  const char* p_;

  void SkipWs() {
    while (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r') ++p_;
  }

  bool ParseValue(JsonValue* out) {
    SkipWs();
    switch (*p_) {
      case '{': return ParseObject(out);
      case '[': return ParseArray(out);
      case '"': out->kind = JsonValue::kString; return ParseString(&out->str);
      case 't':
        if (std::strncmp(p_, "true", 4)) return false;
        p_ += 4; out->kind = JsonValue::kBool; out->boolean = true; return true;
      case 'f':
        if (std::strncmp(p_, "false", 5)) return false;
        p_ += 5; out->kind = JsonValue::kBool; out->boolean = false; return true;
      case 'n':
        if (std::strncmp(p_, "null", 4)) return false;
        p_ += 4; out->kind = JsonValue::kNull; return true;
      default: return ParseNumber(out);
    }
  }

  bool ParseString(std::string* out) {
    if (*p_ != '"') return false;
    ++p_;
    out->clear();
    while (*p_ && *p_ != '"') {
      if (*p_ == '\\') {  // ABI strings never need exotic escapes
        ++p_;
        switch (*p_) {
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          default: out->push_back(*p_); break;
        }
      } else {
        out->push_back(*p_);
      }
      ++p_;
    }
    if (*p_ != '"') return false;
    ++p_;
    return true;
  }

  bool ParseNumber(JsonValue* out) {
    char* end = nullptr;
    double v = std::strtod(p_, &end);
    if (end == p_) return false;
    p_ = end;
    out->kind = JsonValue::kNumber;
    out->number = v;
    return true;
  }

  bool ParseArray(JsonValue* out) {
    out->kind = JsonValue::kArray;
    ++p_;  // '['
    SkipWs();
    if (*p_ == ']') { ++p_; return true; }
    while (true) {
      out->array.emplace_back();
      if (!ParseValue(&out->array.back())) return false;
      SkipWs();
      if (*p_ == ',') { ++p_; continue; }
      if (*p_ == ']') { ++p_; return true; }
      return false;
    }
  }

  bool ParseObject(JsonValue* out) {
    out->kind = JsonValue::kObject;
    ++p_;  // '{'
    SkipWs();
    if (*p_ == '}') { ++p_; return true; }
    while (true) {
      std::string key;
      SkipWs();
      if (!ParseString(&key)) return false;
      SkipWs();
      if (*p_ != ':') return false;
      ++p_;
      out->object.emplace_back(std::move(key), JsonValue());
      if (!ParseValue(&out->object.back().second)) return false;
      SkipWs();
      if (*p_ == ',') { ++p_; continue; }
      if (*p_ == '}') { ++p_; return true; }
      return false;
    }
  }
};

// ---------------- policy ------------------------------------------------
enum Activation { kLinear, kRelu, kElu, kTanh, kSigmoid, kSwish, kSoftmax };

Activation ActivationFromName(const std::string& name) {
  if (name == "relu") return kRelu;
  if (name == "elu") return kElu;
  if (name == "tanh") return kTanh;
  if (name == "sigmoid") return kSigmoid;
  if (name == "swish" || name == "silu") return kSwish;
  if (name == "softmax") return kSoftmax;
  return kLinear;
}

struct Dense {
  int in = 0, out = 0;
  std::vector<float> kernel;  // row-major (in, out)
  std::vector<float> bias;
  Activation activation = kLinear;
};

struct Policy {
  int in_dim = 0;
  int out_dim = 0;
  std::vector<Dense> layers;
  // gait clock metadata (exported by convert_params for policies trained
  // with env.gait_phase_observation): the controller appends
  // [cos(phase), sin(phase)] after the obs history and advances the
  // free-running phase by 2*pi*gait_frequency*control_dt each tick
  bool gait_phase_observation = false;
  double gait_frequency = 0.0;   // Hz
  double control_dt = 0.02;      // s per control tick
  double gait_phase = 0.0;       // runtime clock state
};

void ApplyActivation(Activation a, std::vector<float>* x) {
  switch (a) {
    case kRelu:
      for (auto& v : *x) v = v > 0.f ? v : 0.f;
      break;
    case kElu:
      for (auto& v : *x) v = v > 0.f ? v : std::expm1(v);
      break;
    case kTanh:
      for (auto& v : *x) v = std::tanh(v);
      break;
    case kSigmoid:
      for (auto& v : *x) v = 1.f / (1.f + std::exp(-v));
      break;
    case kSwish:
      for (auto& v : *x) v = v / (1.f + std::exp(-v));
      break;
    case kSoftmax: {
      float mx = (*x)[0];
      for (float v : *x) mx = std::max(mx, v);
      float sum = 0.f;
      for (auto& v : *x) { v = std::exp(v - mx); sum += v; }
      for (auto& v : *x) v /= sum;
      break;
    }
    case kLinear: break;
  }
}

Policy* LoadPolicy(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string text(static_cast<size_t>(size), '\0');
  size_t read = std::fread(&text[0], 1, static_cast<size_t>(size), f);
  std::fclose(f);
  if (read != static_cast<size_t>(size)) return nullptr;

  JsonValue root;
  if (!JsonParser(text.c_str()).Parse(&root) || root.kind != JsonValue::kObject)
    return nullptr;
  const JsonValue* layers = root.find("layers");
  const JsonValue* in_shape = root.find("in_shape");
  if (!layers || layers->kind != JsonValue::kArray || !in_shape ||
      in_shape->kind != JsonValue::kArray || in_shape->array.size() != 2)
    return nullptr;

  auto policy = std::make_unique<Policy>();
  policy->in_dim = static_cast<int>(in_shape->array[1].number);
  if (const JsonValue* g = root.find("gait_phase_observation"))
    policy->gait_phase_observation = g->kind == JsonValue::kBool && g->boolean;
  if (policy->gait_phase_observation) {
    // schema-validate at load, like the layer checks: a non-numeric
    // frequency/dt would silently freeze the clock, and in_dim < 3
    // leaves no room for the 2 clock features (and would underflow the
    // size arithmetic in infer_clocked)
    const JsonValue* f = root.find("gait_frequency");
    const JsonValue* dt = root.find("control_dt");
    if (!f || f->kind != JsonValue::kNumber || !dt ||
        dt->kind != JsonValue::kNumber || policy->in_dim < 3)
      return nullptr;
    policy->gait_frequency = f->number;
    policy->control_dt = dt->number;
  }
  for (const auto& lv : layers->array) {
    const JsonValue* type = lv.find("type");
    const JsonValue* weights = lv.find("weights");
    const JsonValue* act = lv.find("activation");
    if (!type || type->str != "dense" || !weights ||
        weights->array.size() != 2)
      return nullptr;
    const JsonValue& kernel = weights->array[0];
    const JsonValue& bias = weights->array[1];
    Dense d;
    d.in = static_cast<int>(kernel.array.size());
    d.out = static_cast<int>(bias.array.size());
    d.activation = act ? ActivationFromName(act->str) : kLinear;
    d.kernel.reserve(static_cast<size_t>(d.in) * d.out);
    for (const auto& row : kernel.array) {
      if (static_cast<int>(row.array.size()) != d.out) return nullptr;
      for (const auto& v : row.array) d.kernel.push_back(static_cast<float>(v.number));
    }
    d.bias.reserve(d.out);
    for (const auto& v : bias.array) d.bias.push_back(static_cast<float>(v.number));
    policy->layers.push_back(std::move(d));
  }
  if (policy->layers.empty()) return nullptr;
  policy->out_dim = policy->layers.back().out;
  return policy.release();
}

int Infer(const Policy& policy, const float* obs, float* out) {
  std::vector<float> x(obs, obs + policy.in_dim);
  std::vector<float> y;
  for (const auto& layer : policy.layers) {
    if (static_cast<int>(x.size()) != layer.in) return 1;
    y.assign(layer.bias.begin(), layer.bias.end());
    for (int i = 0; i < layer.in; ++i) {
      const float xi = x[i];
      const float* krow = &layer.kernel[static_cast<size_t>(i) * layer.out];
      for (int o = 0; o < layer.out; ++o) y[o] += xi * krow[o];
    }
    ApplyActivation(layer.activation, &y);
    x.swap(y);
  }
  std::memcpy(out, x.data(), x.size() * sizeof(float));
  return 0;
}

}  // namespace

// ---------------- C API -------------------------------------------------
extern "C" {

typedef struct puppax_policy puppax_policy;

puppax_policy* puppax_policy_load(const char* path) {
  return reinterpret_cast<puppax_policy*>(LoadPolicy(path));
}

int puppax_policy_in_dim(const puppax_policy* p) {
  return reinterpret_cast<const Policy*>(p)->in_dim;
}

int puppax_policy_out_dim(const puppax_policy* p) {
  return reinterpret_cast<const Policy*>(p)->out_dim;
}

int puppax_policy_infer(const puppax_policy* p, const float* obs, float* out) {
  return Infer(*reinterpret_cast<const Policy*>(p), obs, out);
}

// Gait-clock entry points: for policies exported with
// gait_phase_observation, the controller passes the RAW obs history
// (in_dim - 2 floats); the runtime appends [cos(phase), sin(phase)],
// infers, then advances the free-running clock — use-then-advance, so
// tick 0 sees phase 0 exactly like the environment's reset observation.
int puppax_policy_gait_enabled(const puppax_policy* p) {
  return reinterpret_cast<const Policy*>(p)->gait_phase_observation ? 1 : 0;
}

double puppax_policy_gait_frequency(const puppax_policy* p) {
  return reinterpret_cast<const Policy*>(p)->gait_frequency;
}

void puppax_policy_reset_clock(puppax_policy* p) {
  reinterpret_cast<Policy*>(p)->gait_phase = 0.0;
}

int puppax_policy_infer_clocked(puppax_policy* p, const float* obs,
                                float* out) {
  Policy* policy = reinterpret_cast<Policy*>(p);
  if (!policy->gait_phase_observation)
    return Infer(*policy, obs, out);
  std::vector<float> full(static_cast<size_t>(policy->in_dim));
  std::memcpy(full.data(), obs, (policy->in_dim - 2) * sizeof(float));
  full[policy->in_dim - 2] = static_cast<float>(std::cos(policy->gait_phase));
  full[policy->in_dim - 1] = static_cast<float>(std::sin(policy->gait_phase));
  const int rc = Infer(*policy, full.data(), out);
  const double two_pi = 6.283185307179586476925286766559;
  policy->gait_phase = std::fmod(
      policy->gait_phase + two_pi * policy->gait_frequency * policy->control_dt,
      two_pi);
  return rc;
}

void puppax_policy_free(puppax_policy* p) {
  delete reinterpret_cast<Policy*>(p);
}

}  // extern "C"
