// Discrete-event TPU performance model (native runtime component).
//
// TPU-native re-design of the reference's cycle-accurate machinery:
// the Module/two-phase-clock framework (simulator/SimCycle.h:55-232),
// FIFO ports with structural-hazard (double read/write) detection
// (SimCycle.h:135-196), the crossbar/DRAM backend pipeline
// (SimOuterSPACE.cpp:361-719), and the per-module printStats dumps.
// Instead of 256 PEs behind crossbars and ramulator-HBM, the simulated
// machine is a TPU core: DMA engines moving blocks between HBM (multi-
// channel, bandwidth/latency modeled) and VMEM, and a compute unit
// (VPU/MXU) consuming double-buffered tiles — i.e., it predicts the cycle
// behavior of the Pallas kernels in ops/pallas/ so the scheduler can
// pick tile sizes without running hardware.
//
// Exposed via a C ABI consumed through ctypes (outerspace_tpu/perf/
// perfsim.py). All knobs runtime-configurable (vs the reference's
// compile-time OuterSPACEConfig, SimOuterSPACE.cpp:17-27).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// Two-phase clocked module framework (parity: SimCycle.h:55-105)
// ---------------------------------------------------------------------

class Module;
static std::vector<Module*>* g_modules = nullptr;

class Module {
 public:
  explicit Module(std::string name) : name_(std::move(name)) {
    if (!g_modules) g_modules = new std::vector<Module*>();
    g_modules->push_back(this);
  }
  virtual ~Module() = default;
  virtual void clockUpdate() = 0;
  virtual void clockApply() = 0;
  virtual void printStats(FILE* f) const {}
  const std::string& name() const { return name_; }

  static void updateAll() {
    for (auto* m : *g_modules) m->clockUpdate();
    for (auto* m : *g_modules) m->clockApply();
  }
  static void clearAll() {
    if (g_modules) g_modules->clear();
  }

 private:
  std::string name_;
};

// FIFO with same-cycle double-access detection (parity: SimCycle.h FIFO
// dirtyRead/dirtyWrite throws, :135-196) and byte counters (SRAMStats,
// :43-53,216-219).
template <typename T>
class Fifo : public Module {
 public:
  Fifo(std::string name, size_t capacity)
      : Module(std::move(name)), capacity_(capacity) {}

  bool canWrite() const { return q_.size() + staged_.size() < capacity_; }
  bool canRead() const { return !q_.empty(); }

  void write(const T& v, size_t bytes) {
    if (dirty_write_) throw std::runtime_error(name() + ": double write");
    if (!canWrite()) throw std::runtime_error(name() + ": overflow");
    dirty_write_ = true;
    staged_.push_back(v);
    bytes_written_ += bytes;
  }
  T read(size_t bytes) {
    if (dirty_read_) throw std::runtime_error(name() + ": double read");
    if (!canRead()) throw std::runtime_error(name() + ": underflow");
    dirty_read_ = true;
    T v = q_.front();
    q_.pop_front();
    bytes_read_ += bytes;
    return v;
  }
  const T& peek() const { return q_.front(); }

  void clockUpdate() override {}
  void clockApply() override {
    for (auto& v : staged_) q_.push_back(v);
    staged_.clear();
    dirty_read_ = dirty_write_ = false;
  }
  void printStats(FILE* f) const override {
    fprintf(f, "  %s: depth=%zu read=%zuB written=%zuB\n", name().c_str(),
            q_.size(), bytes_read_, bytes_written_);
  }

 private:
  size_t capacity_;
  std::deque<T> q_, staged_;
  bool dirty_read_ = false, dirty_write_ = false;
  size_t bytes_read_ = 0, bytes_written_ = 0;
};

// ---------------------------------------------------------------------
// TPU machine model
// ---------------------------------------------------------------------

struct SimConfig {
  double hbm_bytes_per_cycle = 871.0;   // 819 GB/s @ 0.94 GHz
  int hbm_channels = 16;                // interleaved (parity: 16 ch)
  int hbm_latency = 100;                // cycles to first beat
  int dma_max_outstanding = 8;          // concurrent DMAs per engine
  double vpu_lanes = 8 * 128;           // f32 ops/cycle
  double mxu_ops_per_cycle = 16384.0;   // 128x128 MACs/cycle (bf16)
  int grid_overhead = 10;               // cycles per grid step dispatch
};

struct DmaReq {
  int64_t bytes;
  int64_t task_id;
  bool is_write;
};

// HBM: per-channel bandwidth queues; a DMA's beats are striped across
// channels (parity with the page-interleaved channel select,
// SimOuterSPACE.cpp:756-768, minus ramulator timing).
class Hbm : public Module {
 public:
  Hbm(const SimConfig& cfg)
      : Module("hbm"), cfg_(cfg), chan_busy_until_(cfg.hbm_channels, 0) {}

  // Returns completion cycle of a transfer started at `now`.
  int64_t schedule(int64_t now, int64_t bytes) {
    total_bytes_ += bytes;
    ++transfers_;
    double per_chan = cfg_.hbm_bytes_per_cycle / cfg_.hbm_channels;
    int64_t per_chan_bytes = bytes / cfg_.hbm_channels + 1;
    int64_t dur = static_cast<int64_t>(per_chan_bytes / per_chan) + 1;
    int64_t done = 0;
    for (int c = 0; c < cfg_.hbm_channels; ++c) {
      int64_t start = std::max(now + cfg_.hbm_latency, chan_busy_until_[c]);
      chan_busy_until_[c] = start + dur;
      done = std::max(done, start + dur);
    }
    return done;
  }
  void clockUpdate() override {}
  void clockApply() override {}
  void printStats(FILE* f) const override {
    fprintf(f, "  hbm: transfers=%zu bytes=%lld\n", transfers_,
            static_cast<long long>(total_bytes_));
  }

 private:
  SimConfig cfg_;
  std::vector<int64_t> chan_busy_until_;
  int64_t total_bytes_ = 0;
  size_t transfers_ = 0;
};

// Double-buffered kernel pipeline: per grid step, an input DMA, a compute
// phase, and an output DMA, with the classic overlap (the cycle-level
// analogue of the Pallas pipeline; replaces PEMultiplier/PEMerger,
// SimOuterSPACE.cpp:501-606).
struct KernelTiming {
  int64_t cycles = 0;
  int64_t compute_cycles = 0;
  int64_t dma_in_cycles = 0;
  int64_t dma_out_cycles = 0;
  double compute_util = 0.0;
};

KernelTiming simulate_kernel(const SimConfig& cfg, int64_t ntasks,
                             const int64_t* in_bytes,
                             const int64_t* out_bytes,
                             const int64_t* flops, bool use_mxu) {
  Module::clearAll();
  Hbm hbm(cfg);
  double rate = use_mxu ? cfg.mxu_ops_per_cycle : cfg.vpu_lanes;

  int64_t compute_free = 0;   // when the compute unit is next available
  int64_t in_done_prev = 0;   // input DMA completion of current task
  int64_t busy_compute = 0;
  KernelTiming t;
  int64_t now = 0;
  for (int64_t i = 0; i < ntasks; ++i) {
    // Input DMA for task i issues as soon as the previous compute started
    // (double buffering): model as issue at max(now, compute_free - 1).
    int64_t in_done = hbm.schedule(now, in_bytes[i]);
    int64_t c_dur =
        static_cast<int64_t>(flops[i] / rate) + 1 + cfg.grid_overhead;
    int64_t c_start = std::max(in_done, compute_free);
    int64_t c_end = c_start + c_dur;
    busy_compute += c_dur;
    compute_free = c_end;
    int64_t out_done = hbm.schedule(c_end, out_bytes[i]);
    now = std::max(now + 1, in_done_prev);  // issue next task's DMA
    in_done_prev = in_done;
    t.cycles = std::max(t.cycles, out_done);
  }
  t.compute_cycles = busy_compute;
  t.compute_util =
      t.cycles > 0 ? static_cast<double>(busy_compute) / t.cycles : 0.0;
  return t;
}

}  // namespace

extern "C" {

// Simulate a Pallas-style kernel: ntasks grid steps with per-task input
// bytes, output bytes, and flops. Returns total cycles; fills util[0]
// with compute utilization if non-null.
int64_t osp_sim_kernel(int64_t ntasks, const int64_t* in_bytes,
                       const int64_t* out_bytes, const int64_t* flops,
                       int use_mxu, double* util) {
  SimConfig cfg;
  KernelTiming t = simulate_kernel(cfg, ntasks, in_bytes, out_bytes,
                                   flops, use_mxu != 0);
  if (util) *util = t.compute_util;
  return t.cycles;
}

// Uniform-task convenience wrapper.
int64_t osp_sim_kernel_uniform(int64_t ntasks, int64_t in_bytes,
                               int64_t out_bytes, int64_t flops,
                               int use_mxu, double* util) {
  std::vector<int64_t> ib(ntasks, in_bytes), ob(ntasks, out_bytes),
      fl(ntasks, flops);
  return osp_sim_kernel(ntasks, ib.data(), ob.data(), fl.data(), use_mxu,
                        util);
}

// Structural-hazard self-test of the FIFO framework (used by unit tests
// to prove the double-access detection fires, parity with
// SimCycle.h:135-196).
int osp_sim_fifo_selftest() {
  Module::clearAll();
  Fifo<int> f("t", 4);
  f.write(1, 8);
  Module::updateAll();
  if (!f.canRead()) return 1;
  (void)f.read(8);
  try {
    (void)f.read(8);  // double read in the same cycle: must throw
    return 2;
  } catch (const std::runtime_error&) {
  }
  Module::updateAll();
  return 0;
}

}  // extern "C"
