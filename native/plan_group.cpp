// Native greedy row placement — the only per-element host loop in the
// conversion path (see spmv_tpu/formats/base.py:_emit_rows for the
// reference semantics and the NumPy fallback).  The TPU framework's
// counterpart of the reference's C conversion loops (coo.c:75-84,
// csr.c:68-91, ell.c:68-164, sigma_c.c:71-204, cmrs.c:72-117), which are
// per-element fscanf/format loops in C.
//
// Sublane rows arrive sorted by (block, stripe).  Pad rows are inserted so
// that (a) every aligned 8-row group's stripe min-max span stays < 8 (one
// (8,128) x-table window per group) and (b) every aligned 128-row window's
// block span stays < wcap (the streamed per-row y-window target is u8).
// Pad rows replicate their predecessor's (block, stripe), which satisfies
// both constraints by construction.  There is no block-purity requirement:
// the engines reduce rows into a y window by the streamed target, so rows
// of different y blocks share groups freely.

#include <cstdint>

namespace {
constexpr int64_t kSublanes = 8;
constexpr int64_t kLanes = 128;

inline int64_t mn(int64_t a, int64_t b) { return a < b ? a : b; }
inline int64_t mx(int64_t a, int64_t b) { return a < b ? b : a; }
}  // namespace

extern "C" {

int64_t spmv_plan_abi_version() { return 3; }

// Dense per-run slot packing with at most ONE segment boundary per quad
// slot (the in-kernel prefix-difference correction ``c2`` can subtract a
// single next-segment head per quad — kernels/engines.py).  Segments of a
// run pack contiguously; segment j starts right after j-1's end unless
// (a) it would END in j-1's end quad, or (b) the shared quad is the LAST
// quad of a sublane row — the segment then spills into the next row and
// its row-portion would be exactly the c2-subtracted head with gi == pi
// (a zero piece) — in either case it starts at the next quad instead.
// sizes/run are per-segment (segments ordered run-major); writes each
// segment's start slot (within its run) to out_f.
void spmv_pack_run_slots(const int64_t* sizes, const int64_t* run,
                         int64_t nseg, int64_t pack, int64_t* out_f) {
  constexpr int64_t kRowCap = kLanes - 1;  // quads per sublane row
  int64_t cur_run = -1;
  int64_t prev_end = -1;
  for (int64_t j = 0; j < nseg; ++j) {
    int64_t f;
    if (run[j] != cur_run) {
      cur_run = run[j];
      f = 0;
    } else {
      f = prev_end + 1;
      if ((f % pack) &&
          ((f + sizes[j] - 1) / pack == prev_end / pack ||
           (f / pack) % kRowCap == kRowCap - 1)) {
        f = (prev_end / pack + 1) * pack;
      }
    }
    out_f[j] = f;
    prev_end = f + sizes[j] - 1;
  }
}

// Places n subrows; writes the final row index of each into row_of and the
// per-output-row (block, stripe) into out_blk/out_stp (capacity `cap`).
// Returns the total emitted row count T (pads included, NOT rounded to 8).
// If T would exceed cap, returns -T without writing beyond cap — callers
// re-invoke with a large enough buffer.
int64_t spmv_emit_rows(const int64_t* blk, const int64_t* stp, int64_t n,
                       int64_t wcap, int64_t* row_of, int64_t* out_blk,
                       int64_t* out_stp, int64_t cap) {
  int64_t t = 0;
  int64_t gmin = 0, gmax = 0, wmin = 0, wmax = 0;
  bool overflow = false;
  auto emit = [&](int64_t b, int64_t s) {
    if (t < cap) {
      out_blk[t] = b;
      out_stp[t] = s;
    } else {
      overflow = true;
    }
    ++t;
  };
  for (int64_t i = 0; i < n; ++i) {
    const int64_t b = blk[i];
    const int64_t s = stp[i];
    if ((t % kSublanes) && (mx(gmax, s) - mn(gmin, s) >= kSublanes)) {
      const int64_t pb = out_blk[mn(t, cap) - 1];
      const int64_t ps = out_stp[mn(t, cap) - 1];
      while (t % kSublanes) emit(pb, ps);
    }
    if ((t % kLanes) && (mx(wmax, b) - mn(wmin, b) >= wcap)) {
      const int64_t pb = out_blk[mn(t, cap) - 1];
      const int64_t ps = out_stp[mn(t, cap) - 1];
      while (t % kLanes) emit(pb, ps);
    }
    if (t % kSublanes == 0) {
      gmin = gmax = s;
    } else {
      gmin = mn(gmin, s);
      gmax = mx(gmax, s);
    }
    if (t % kLanes == 0) {
      wmin = wmax = b;
    } else {
      wmin = mn(wmin, b);
      wmax = mx(wmax, b);
    }
    row_of[i] = t;
    emit(b, s);
  }
  return overflow ? -t : t;
}

}  // extern "C"
