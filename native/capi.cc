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
#include <vector>

#include "denoise_engine.h"

extern "C" {

struct RNNModel;   // opaque: actually nnt::RnnModel
struct DenoiseState;  // opaque: holds one engine state

}  // extern "C"

namespace {

// The caller-visible state block: engine state by value so that
// caller-allocated `rnnoise_get_size()` storage + `rnnoise_init` works
// without heap allocation tricks.
struct StateBlock {
  nnt::DenoiseState* engine;
  const nnt::RnnModel* model;
};

inline StateBlock* as_block(DenoiseState* st) {
  return reinterpret_cast<StateBlock*>(st);
}

}  // namespace

extern "C" {

int rnnoise_get_frame_size(void) { return nnt::kFrameSize; }

size_t rnnoise_get_size(void) { return sizeof(StateBlock); }

int rnnoise_init(DenoiseState* st, RNNModel* model) {
  if (!st) return -1;
  StateBlock* b = as_block(st);
  b->model = reinterpret_cast<const nnt::RnnModel*>(model);
  b->engine = new (std::nothrow) nnt::DenoiseState(b->model);
  return b->engine ? 0 : -1;
}

DenoiseState* rnnoise_create(RNNModel* model) {
  StateBlock* b = static_cast<StateBlock*>(std::malloc(sizeof(StateBlock)));
  if (!b) return nullptr;
  if (rnnoise_init(reinterpret_cast<DenoiseState*>(b), model) != 0) {
    std::free(b);
    return nullptr;
  }
  return reinterpret_cast<DenoiseState*>(b);
}

void rnnoise_destroy(DenoiseState* st) {
  if (!st) return;
  StateBlock* b = as_block(st);
  delete b->engine;
  std::free(b);
}

float rnnoise_process_frame(DenoiseState* st, float* out, const float* in) {
  return as_block(st)->engine->ProcessFrame(out, in);
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

void rnnoise_reset(DenoiseState* st) { as_block(st)->engine->Reset(); }

// Process a contiguous run of frames for one stream in a single call
// (amortizes FFI overhead for the Python binding).
void nnt_process_frames(DenoiseState* st, float* out, const float* in,
                        int n_frames, float* vad_out) {
  nnt::DenoiseState* e = as_block(st)->engine;
  for (int t = 0; t < n_frames; ++t) {
    float v = e->ProcessFrame(out + static_cast<size_t>(t) * nnt::kFrameSize,
                              in + static_cast<size_t>(t) * nnt::kFrameSize);
    if (vad_out) vad_out[t] = v;
  }
}

RNNModel* nnt_model_from_bytes(const unsigned char* data, size_t len) {
  auto model = nnt::RnnModel::FromBytes(data, len);
  return reinterpret_cast<RNNModel*>(model.release());
}

}  // extern "C"
