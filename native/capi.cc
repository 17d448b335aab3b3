// RNNoise-compatible C ABI over the native engine (SURVEY.md C26).
//
// Mirrors the reference's exported surface (reference src/capi.rs:17-113):
// create/init/destroy/process_frame/get_frame_size/get_size/model_from_file/
// model_free, with the same calling conventions — `rnnoise_init` constructs
// into caller-provided storage of `rnnoise_get_size()` bytes, and a model
// passed at creation must outlive the state.

#include <cstdio>
#include <cstdlib>
#include <new>
#include <type_traits>
#include <vector>

#include "denoise_engine.h"

extern "C" {

struct RNNModel;   // opaque: actually nnt::RnnModel
struct DenoiseState;  // opaque: holds one engine state

}  // extern "C"

namespace {

// nnt::DenoiseState is flat and trivially destructible, so the reference's
// caller-managed-storage contract holds exactly: rnnoise_get_size() bytes
// of any storage + rnnoise_init == a fully constructed state; re-init is a
// plain reconstruction (no leaks); rnnoise_destroy is free().
inline nnt::DenoiseState* as_engine(DenoiseState* st) {
  return reinterpret_cast<nnt::DenoiseState*>(st);
}

static_assert(std::is_trivially_destructible<nnt::DenoiseState>::value,
              "caller-storage ABI requires a trivially destructible state");

}  // namespace

extern "C" {

int rnnoise_get_frame_size(void) { return nnt::kFrameSize; }

size_t rnnoise_get_size(void) { return sizeof(nnt::DenoiseState); }

int rnnoise_init(DenoiseState* st, RNNModel* model) {
  if (!st) return -1;
  new (st) nnt::DenoiseState(reinterpret_cast<const nnt::RnnModel*>(model));
  return 0;
}

DenoiseState* rnnoise_create(RNNModel* model) {
  void* storage = std::malloc(sizeof(nnt::DenoiseState));
  if (!storage) return nullptr;
  new (storage) nnt::DenoiseState(reinterpret_cast<const nnt::RnnModel*>(model));
  return reinterpret_cast<DenoiseState*>(storage);
}

void rnnoise_destroy(DenoiseState* st) {
  // Trivially destructible: only for states from rnnoise_create (malloc'd);
  // caller-allocated + rnnoise_init states are freed by the caller.
  std::free(st);
}

float rnnoise_process_frame(DenoiseState* st, float* out, const float* in) {
  return as_engine(st)->ProcessFrame(out, in);
}

RNNModel* rnnoise_model_from_file(FILE* f) {
  if (!f) return nullptr;
  std::vector<unsigned char> buf;
  unsigned char chunk[4096];
  size_t n;
  while ((n = std::fread(chunk, 1, sizeof(chunk), f)) > 0)
    buf.insert(buf.end(), chunk, chunk + n);
  auto model = nnt::RnnModel::FromBytes(buf.data(), buf.size());
  return reinterpret_cast<RNNModel*>(model.release());
}

void rnnoise_model_free(RNNModel* model) {
  delete reinterpret_cast<nnt::RnnModel*>(model);
}

// ---- extensions beyond the reference ABI (batch + reset) -----------------

void rnnoise_reset(DenoiseState* st) { as_engine(st)->Reset(); }

// Process a contiguous run of frames for one stream in a single call
// (amortizes FFI overhead for the Python binding).
void nnt_process_frames(DenoiseState* st, float* out, const float* in,
                        int n_frames, float* vad_out) {
  nnt::DenoiseState* e = as_engine(st);
  for (int t = 0; t < n_frames; ++t) {
    float v = e->ProcessFrame(out + static_cast<size_t>(t) * nnt::kFrameSize,
                              in + static_cast<size_t>(t) * nnt::kFrameSize);
    if (vad_out) vad_out[t] = v;
  }
}

// Pitch trace after the last processed frame (period in the original-rate
// domain, gain in [0, 1]) — for lag-exact cross-checks vs the JAX engine.
void nnt_get_pitch(DenoiseState* st, int* period, float* gain) {
  const nnt::DenoiseState* e = as_engine(st);
  if (period) *period = e->last_period();
  if (gain) *gain = e->last_gain();
}

// Host-side training-data augmentation (the reference's `train` binary is
// native, src/training.rs:397-400): biquad with f32-rounded state and f64
// inner arithmetic, applied in place.
void nnt_biquad_inplace(float* x, int n, const float* a, const float* b,
                        float* mem) {
  double a0 = a[0], a1 = a[1], b0 = b[0], b1 = b[1];
  float m0 = mem[0], m1 = mem[1];
  for (int i = 0; i < n; ++i) {
    double xi = x[i];
    double y = xi + m0;
    m0 = static_cast<float>(m1 + (b0 * xi - a0 * y));
    m1 = static_cast<float>(b1 * xi - a1 * y);
    x[i] = static_cast<float>(y);
  }
  mem[0] = m0;
  mem[1] = m1;
}

RNNModel* nnt_model_from_bytes(const unsigned char* data, size_t len) {
  auto model = nnt::RnnModel::FromBytes(data, len);
  return reinterpret_cast<RNNModel*>(model.release());
}

}  // extern "C"
