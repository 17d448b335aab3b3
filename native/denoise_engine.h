// nnnoiseless_tpu native runtime: host-side (CPU) denoise engine.
//
// This is the framework's native-code component: a from-scratch C++17
// implementation of the full RNNoise-lineage per-frame pipeline (48 kHz mono,
// 10 ms frames, 42-dim DSP features, int8 GRU network, pitch comb filter,
// overlap-add synthesis).  It serves three roles:
//
//   1. the RNNoise-compatible C ABI (capi.cc) — drop-in for C callers of the
//      reference library (reference surface: src/capi.rs);
//   2. a zero-dependency host fallback / serving path for single streams
//      where a TPU round-trip is not worth it;
//   3. an independent correctness oracle cross-checked against both the JAX
//      engine and the golden reference output in tests.
//
// The algorithm spec matches SURVEY.md §2/§3 (feature layout, silence gate,
// gain hangover, pitch search and octave removal); the implementation is
// original and organized around flat std::array state, precomputed
// band/DCT/DFT tables, and branch-light inner loops the auto-vectorizer
// handles well.

#pragma once

#include <array>
#include <cstddef>
#include <cstdint>
#include <memory>
#include <vector>

namespace nnt {

// ---- geometry (SURVEY.md §1 global constants) -----------------------------
constexpr int kFrameSize = 480;       // 10 ms @ 48 kHz
constexpr int kWindowSize = 960;      // two frames, 50% overlap
constexpr int kFreqSize = kWindowSize / 2 + 1;  // 481 real-DFT bins
constexpr int kPitchMinPeriod = 60;
constexpr int kPitchMaxPeriod = 768;
constexpr int kPitchFrameSize = 960;
constexpr int kPitchBufSize = kPitchMaxPeriod + kPitchFrameSize;  // 1728
constexpr int kNbBands = 22;
constexpr int kCepsMem = 8;
constexpr int kNbDeltaCeps = 6;
constexpr int kNbFeatures = kNbBands + 3 * kNbDeltaCeps + 2;  // 42
constexpr float kWeightsScale = 1.0f / 256.0f;

// Hard upper bound on neurons per layer: the engine uses fixed-size state
// and scratch buffers, and the parser rejects models above this (the stock
// topology tops out at 96).  Also bounds every concat input
// (96 + 96 + 42 < kMaxConcatInputs).
constexpr int kMaxNeurons = 96;
constexpr int kMaxConcatInputs = 256;

// ---- model ---------------------------------------------------------------

enum class Activation : int { kTanh = 0, kSigmoid = 1, kRelu = 2 };

struct DenseLayer {
  int nb_inputs = 0;
  int nb_neurons = 0;
  Activation activation = Activation::kTanh;
  std::vector<int8_t> weights;  // input-major: w[i * nb_neurons + j]... see parser
  std::vector<int8_t> bias;
};

struct GruLayer {
  int nb_inputs = 0;
  int nb_neurons = 0;
  Activation activation = Activation::kTanh;
  std::vector<int8_t> input_weights;      // nb_inputs x 3*nb_neurons
  std::vector<int8_t> recurrent_weights;  // nb_neurons x 3*nb_neurons
  std::vector<int8_t> bias;               // 3*nb_neurons
};

// The six-layer topology of the .rnn binary format (SURVEY.md C19).
struct RnnModel {
  DenseLayer input_dense;
  GruLayer vad_gru;
  GruLayer noise_gru;
  GruLayer denoise_gru;
  DenseLayer denoise_output;
  DenseLayer vad_output;

  // Parses the concatenated int8 layer format; returns nullptr on malformed,
  // truncated, trailing-garbage, or topologically invalid input.
  static std::unique_ptr<RnnModel> FromBytes(const uint8_t* data, size_t len);
  static std::unique_ptr<RnnModel> FromFile(const char* path);
};

// ---- engine --------------------------------------------------------------

// Flat, trivially-destructible state: no heap allocations, so the C ABI's
// caller-managed-storage contract (rnnoise_get_size / rnnoise_init on a
// user-provided block) holds exactly (reference surface src/capi.rs).
class DenoiseState {
 public:
  // model == nullptr selects the built-in default weights.  When `model` is
  // non-null the caller keeps ownership and must outlive this state.
  explicit DenoiseState(const RnnModel* model = nullptr);

  // Denoise one 480-sample frame (f32 samples in the i16 range).
  // Returns the voice-activity probability.  in/out may alias.
  float ProcessFrame(float* out, const float* in);

  void Reset();

  // Pitch state after the last ProcessFrame (the post-RemoveDoubling period
  // and gain) — exposed for lag-exact cross-checks against the JAX engine.
  int last_period() const { return last_period_; }
  float last_gain() const { return last_gain_; }

 private:
  const RnnModel* model_;

  // Recurrent state (the 7 carries of SURVEY.md §5).
  float input_mem_[kPitchBufSize];
  float hp_mem_[2];  // f32 state, f64 per-sample arithmetic
  float cepstral_mem_[kCepsMem][kNbBands];
  int mem_id_;
  float synthesis_mem_[kFrameSize];
  float vad_state_[kMaxNeurons];
  float noise_state_[kMaxNeurons];
  float denoise_state_[kMaxNeurons];
  float lastg_[kNbBands];
  int last_period_;
  float last_gain_;

  void TransformAtLag(float* re, float* im, float* bande, int lag);
};

// Default embedded model (parsed once, shared).
const RnnModel& DefaultModel();

}  // namespace nnt
