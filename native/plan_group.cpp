// Native greedy subtile grouping — the only per-element host loop in the
// conversion path (see spmv_tpu/formats/base.py:_group_subtiles for the
// reference semantics and the NumPy fallback).  The TPU framework's
// counterpart of the reference's C conversion loops (coo.c:75-84,
// csr.c:68-91, ell.c:68-164, sigma_c.c:71-204, cmrs.c:72-117), which are
// per-element fscanf/format loops in C.
//
// Sublane rows arrive sorted by (block, stripe); consecutive rows join a
// subtile while it has < 8 rows, they share the block, and the stripe span
// stays < 8 (so the kernel's x window is one (8,128) slice).  Violations
// close the subtile early with pad rows.

#include <cstdint>

namespace {
constexpr int64_t kSublanes = 8;
}

extern "C" {

int64_t spmv_plan_abi_version() { return 1; }

// Returns the number of subtiles.  slot_out must hold n entries;
// blocks_out/bases_out must hold at least n entries (ntiles <= n).
int64_t spmv_group_subtiles(const int64_t* subrow_blk,
                            const int64_t* subrow_stp, int64_t n, int64_t s_rows,
                            int64_t* slot_out, int32_t* blocks_out,
                            int32_t* bases_out) {
  int64_t tile = -1;
  int64_t count = kSublanes;  // force a new tile on the first subrow
  int64_t cur_blk = -1;
  int64_t base = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t b = subrow_blk[i];
    const int64_t s = subrow_stp[i];
    if (count == kSublanes || b != cur_blk || s - base >= kSublanes) {
      ++tile;
      count = 0;
      cur_blk = b;
      base = s;
      blocks_out[tile] = static_cast<int32_t>(b);
      const int64_t clamped = s < s_rows - kSublanes ? s : s_rows - kSublanes;
      bases_out[tile] = static_cast<int32_t>(clamped < 0 ? 0 : clamped);
    }
    slot_out[i] = tile * kSublanes + count;
    ++count;
  }
  return tile + 1;
}

}  // extern "C"
