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

#include <algorithm>
#include <cstdint>
#include <deque>
#include <vector>

namespace {
constexpr int64_t kSublanes = 8;
constexpr int64_t kLanes = 128;

inline int64_t mn(int64_t a, int64_t b) { return a < b ? a : b; }
inline int64_t mx(int64_t a, int64_t b) { return a < b ? b : a; }
}  // namespace

extern "C" {

int64_t spmv_plan_abi_version() { return 5; }

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

// Pooled per-lane-hi packing (round 5).  Elements arrive sorted by
// (pool, lid, stripe, col) where pool = (128-row block, aligned 8-stripe
// window).  Rows of one pool may mix the window's stripes because the
// kernels' two-step x-gather reads ``hi`` per LANE (engines.py
// _packed_products: T[r,c] = win[hi[r,c], c] then a lane gather at lo) —
// exactness only needs the per-row map lane→stripe to be a function.
// The walk places each element into the current open row when its lo is
// unmapped or mapped to the same stripe, defers conflicts to a fresh
// pass (fresh rows keep the per-row lid order intact), and closes rows
// at capacity pack·127 element slots.  Segment (lid) transitions follow
// spmv_pack_run_slots' quad rules; pieces of one lid across stripes
// merge into a single gidx segment (they sum into the same y row).
//
// Outputs per element: erow (global sublane-row id), slot (0..pack·127-1),
// msb (element lies in a quad shared with the previous segment's end —
// the kernel's c2 flag).  Outputs per emitted row: row_pool (pool id).
// Returns the emitted row count R, or -R when it exceeds row_cap.
int64_t spmv_pool_pack(const int64_t* pool_id, const int64_t* lid,
                       const int64_t* stp, const int64_t* lo, int64_t n,
                       int64_t pack, int64_t* erow, int64_t* slot,
                       uint8_t* msb, int64_t* row_pool, int64_t row_cap) {
  constexpr int64_t kRowCap = kLanes - 1;  // quads per sublane row
  const int64_t cap = pack * kRowCap;     // element slots per row
  int64_t r = 0;  // emitted rows
  bool overflow = false;

  int64_t map_stripe[kLanes];
  int64_t map_epoch[kLanes];
  for (int64_t i = 0; i < kLanes; ++i) map_epoch[i] = -1;
  int64_t epoch = 0;

  int64_t* defer = new int64_t[n > 0 ? n : 1];
  int64_t* defer2 = new int64_t[n > 0 ? n : 1];
  int64_t* good = new int64_t[n > 0 ? n : 1];

  int64_t a = 0;
  while (a < n) {
    int64_t b = a;
    while (b < n && pool_id[b] == pool_id[a]) ++b;
    const int64_t pool = pool_id[a];
    // pass 0 runs over [a, b); later passes over the defer buffer
    int64_t cur_n = b - a;
    bool first_pass = true;
    while (cur_n > 0) {
      int64_t ndef = 0;
      ++epoch;
      int64_t prev_end = -1;
      int64_t prev_lid = -1;
      bool row_open = false;
      int64_t i = 0;
      while (i < cur_n) {
        const int64_t e0 = first_pass ? a + i : defer[i];
        const int64_t l0 = lid[e0];
        const int64_t s0 = stp[e0];
        // piece = maximal run of same (lid, stripe)
        int64_t j = i;
        while (j < cur_n) {
          const int64_t e = first_pass ? a + j : defer[j];
          if (lid[e] != l0 || stp[e] != s0) break;
          ++j;
        }
        // split good/bad against the map AS OF PIECE START (distinct lo
        // within a piece and same-stripe updates make the mask static; a
        // mid-piece row close does not resurrect the piece's bad subset —
        // matches the vectorized fallback exactly)
        int64_t m = 0;
        for (int64_t k = i; k < j; ++k) {
          const int64_t e = first_pass ? a + k : defer[k];
          const int64_t L = lo[e];
          if (map_epoch[L] != epoch || map_stripe[L] == s0) good[m++] = e;
          else defer2[ndef++] = e;
        }
        if (m > 0) {
          int64_t f = prev_end + 1;
          if (l0 != prev_lid) {  // segment boundary: quad rules
            if ((f % pack) &&
                ((f + m - 1) / pack == prev_end / pack ||
                 (f / pack) % kRowCap == kRowCap - 1)) {
              f = (prev_end / pack + 1) * pack;
            }
          }
          // msb marks the new segment's elements in the quad it shares
          // with the previous segment's end (the kernel's c2 flag)
          int64_t shared_quad =
              (l0 != prev_lid && (f % pack) != 0) ? f / pack : -1;
          for (int64_t k = 0; k < m; ++k) {
            const int64_t e = good[k];
            if (f >= cap) {  // close the row, continue in a fresh one
              if (row_open) {
                if (r < row_cap) row_pool[r] = pool;
                else overflow = true;
                ++r;
                row_open = false;
              }
              ++epoch;
              f = 0;
              prev_end = -1;
              shared_quad = -1;  // fresh row: quad-aligned start
            }
            row_open = true;
            if (!overflow) {
              erow[e] = r;
              slot[e] = f;
              msb[e] = (f / pack == shared_quad) ? 1 : 0;
            }
            map_epoch[lo[e]] = epoch;
            map_stripe[lo[e]] = s0;
            prev_end = f;
            ++f;
          }
          prev_lid = l0;
        }
        i = j;
      }
      if (row_open) {
        if (r < row_cap) row_pool[r] = pool;
        else overflow = true;
        ++r;
      }
      // swap defer buffers
      int64_t* tmp = defer;
      defer = defer2;
      defer2 = tmp;
      cur_n = ndef;
      first_pass = false;
    }
    a = b;
  }
  delete[] defer;
  delete[] defer2;
  delete[] good;
  return overflow ? -r : r;
}

// Two-bank drain-queue packing walk (see spmv_tpu/formats/bank.py for
// the semantics and the NumPy reference — tests pin exact parity,
// including the fp-order quirks of the queue splices).  Elements arrive
// sorted by (pool, lid, stripe, col); pieces are maximal same-(pool,
// lid, stripe) runs.  Per element writes (erow, slot, msb, bank); per
// emitted row writes row_pool.  Returns the emitted row count, or its
// negation when row_cap was too small (caller retries with the exact
// capacity).
int64_t spmv_bank_pack(const int64_t* pool_id, const int64_t* lid,
                       const int64_t* stp, const int64_t* lo, int64_t n,
                       int64_t pack, int64_t* erow, int64_t* slot,
                       uint8_t* msb, uint8_t* bank, int64_t* row_pool,
                       int64_t row_cap) {
  constexpr int64_t kRowCap = kLanes - 1;  // quads per sublane row
  const int64_t cap = pack * kRowCap;     // element slots per row
  int64_t r = 0;
  bool overflow = false;

  struct Piece {
    int64_t l0, s0;
    std::vector<int64_t> idx;  // element indices (global, sorted order)
  };

  int64_t map_stripe[2][kLanes];
  int64_t map_epoch[2][kLanes];
  for (int64_t b = 0; b < 2; ++b)
    for (int64_t i = 0; i < kLanes; ++i) map_epoch[b][i] = -1;
  int64_t epoch = 0;

  std::vector<int64_t> good;
  good.reserve(1024);

  int64_t a = 0;
  while (a < n) {
    int64_t b_end = a;
    while (b_end < n && pool_id[b_end] == pool_id[a]) ++b_end;
    const int64_t pool = pool_id[a];

    std::deque<Piece> work;
    for (int64_t i = a; i < b_end;) {
      int64_t j = i;
      while (j < b_end && lid[j] == lid[i] && stp[j] == stp[i]) ++j;
      Piece p;
      p.l0 = lid[i];
      p.s0 = stp[i];
      p.idx.reserve(j - i);
      for (int64_t k = i; k < j; ++k) p.idx.push_back(k);
      work.push_back(std::move(p));
      i = j;
    }
    std::vector<Piece> queue;

    ++epoch;
    int64_t prev_end = -1;
    int64_t prev_lid = -1;
    bool row_open = false;

    auto close_row = [&]() {
      if (row_open) {
        if (r < row_cap) row_pool[r] = pool;
        else overflow = true;
        ++r;
        row_open = false;
      }
      ++epoch;
      prev_end = -1;
      prev_lid = -1;
    };

    while (!work.empty() || !queue.empty()) {
      if (work.empty()) {  // pool tail: retry the deferred parts
        close_row();
        std::stable_sort(queue.begin(), queue.end(),
                         [](const Piece& x, const Piece& y) {
                           return x.l0 < y.l0;
                         });
        for (auto& q : queue) work.push_back(std::move(q));
        queue.clear();
        continue;
      }
      Piece cur = std::move(work.front());
      work.pop_front();
      const int64_t l0 = cur.l0;
      const int64_t s0 = cur.s0;
      good.clear();
      Piece bad;
      bad.l0 = l0;
      bad.s0 = s0;
      for (int64_t e : cur.idx) {
        const int64_t L = lo[e];
        const bool ok0 = map_epoch[0][L] != epoch || map_stripe[0][L] == s0;
        const bool ok1 = map_epoch[1][L] != epoch || map_stripe[1][L] == s0;
        if (ok0 || ok1) good.push_back(e);
        else bad.idx.push_back(e);
      }
      if (!bad.idx.empty()) queue.push_back(std::move(bad));
      int64_t placed = 0;
      bool did_overflow = false;
      int64_t of_start = 0;
      const int64_t m_all = (int64_t)good.size();
      while (placed < m_all) {
        int64_t f = prev_end + 1;
        const int64_t rem = m_all - placed;
        if (l0 != prev_lid && (f % pack) &&
            ((f + rem - 1) / pack == prev_end / pack ||
             (f / pack) % kRowCap == kRowCap - 1)) {
          f = (prev_end / pack + 1) * pack;
        }
        if (f >= cap) {
          did_overflow = true;
          of_start = placed;
          break;
        }
        const int64_t shared_quad =
            (l0 != prev_lid && (f % pack) != 0) ? f / pack : -1;
        row_open = true;
        const int64_t take = mn(cap - f, m_all - placed);
        for (int64_t k = 0; k < take; ++k) {
          const int64_t e = good[placed + k];
          const int64_t L = lo[e];
          const int64_t sl = f + k;
          if (!overflow) {
            erow[e] = r;
            slot[e] = sl;
            msb[e] = (shared_quad >= 0 && sl / pack == shared_quad) ? 1 : 0;
            // matched bank first, else bank 0 if free, else bank 1
            const bool in0 =
                map_epoch[0][L] == epoch && map_stripe[0][L] == s0;
            const bool in1 =
                map_epoch[1][L] == epoch && map_stripe[1][L] == s0;
            const bool free0 = map_epoch[0][L] != epoch;
            const bool use1 = !in0 && (in1 || !free0);
            bank[e] = use1 ? 1 : 0;
            map_epoch[use1 ? 1 : 0][L] = epoch;
            map_stripe[use1 ? 1 : 0][L] = s0;
          } else {
            const bool in0 =
                map_epoch[0][L] == epoch && map_stripe[0][L] == s0;
            const bool free0 = map_epoch[0][L] != epoch;
            const bool use1 = !in0 && !free0;
            map_epoch[use1 ? 1 : 0][L] = epoch;
            map_stripe[use1 ? 1 : 0][L] = s0;
          }
        }
        prev_end = f + take - 1;
        prev_lid = l0;
        placed += take;
      }
      if (did_overflow) {
        close_row();
        Piece restp;
        restp.l0 = l0;
        restp.s0 = s0;
        restp.idx.assign(good.begin() + of_start, good.end());
        work.push_front(std::move(restp));
        // splice the queue in front, ascending lid at the deque front
        // (mirrors the Python reverse-sorted appendleft loop)
        std::stable_sort(queue.begin(), queue.end(),
                         [](const Piece& x, const Piece& y) {
                           return x.l0 > y.l0;
                         });
        for (auto& q : queue) work.push_front(std::move(q));
        queue.clear();
      }
    }
    close_row();
    a = b_end;
  }
  return overflow ? -r : r;
}

}  // extern "C"
