// Native preprocessing kernels for shud_tpu.
//
// The compute path is JAX/XLA; this library provides the C++ runtime pieces
// around it — the O(N) sequential mesh-preprocessing passes that a Python
// loop cannot sustain at the 10M-cell scale the weak-scaling benchmarks
// target (reference counterparts: Model_Data::rmSinks at
// Model_Data.cpp:238-266, _Element::applyNabor at Element.cpp:238-270, and
// the partition ghost-table construction which has no reference counterpart
// since the reference is single-process).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <vector>

extern "C" {

// Sequential sink removal (order-dependent, matches the reference's
// in-place semantics exactly: earlier cells' raised elevations are seen by
// later cells).
void shud_rm_sinks(int64_t ne, const int64_t *nabr /* [ne][3], -1 none */,
                   const int64_t *riv_id /* [ne], >0 means river cell */,
                   const double *aq_depth, double *z_surf, double *z_bottom) {
    for (int64_t i = 0; i < ne; i++) {
        double zmin_nb = 1.0e200;
        bool any = false;
        for (int j = 0; j < 3; j++) {
            int64_t nb = nabr[i * 3 + j];
            if (nb >= 0) {
                any = true;
                if (z_surf[nb] < zmin_nb) zmin_nb = z_surf[nb];
            }
        }
        if (any && zmin_nb > z_surf[i] && riv_id[i] <= 0) {
            z_surf[i] = zmin_nb;
            z_bottom[i] = zmin_nb - aq_depth[i];
        }
    }
}

// Reciprocal edge index: out[i][j] = k such that nabr[nabr[i][j]][k] == i.
void shud_nabr_to_me(int64_t ne, const int64_t *nabr, int64_t *out) {
    for (int64_t i = 0; i < ne; i++) {
        for (int j = 0; j < 3; j++) {
            int64_t nb = nabr[i * 3 + j];
            int64_t r = -1;
            if (nb >= 0) {
                for (int k = 0; k < 3; k++) {
                    if (nabr[nb * 3 + k] == i) r = k;
                }
            }
            out[i * 3 + j] = r;
        }
    }
}

// Ghost/export tables for the domain decomposition.
// Inputs: per-cell owner shard and local slot, neighbour arrays.
// Pass 1 (count_only=1): returns per-shard export counts in export_counts.
// Pass 2 (count_only=0): fills export_idx [p][b_ghost] (slot lists, sorted)
// and the per-edge (nb_shard, nb_slot) tables, where nb_shard == -1 means
// local/none and nb_slot is the local slot (local) or the position in the
// owner's export list (remote).
void shud_ghost_tables(int64_t ne, int64_t p, const int64_t *nabr,
                       const int64_t *shard_of, const int64_t *slot_of,
                       int64_t b_ghost, int32_t count_only,
                       int64_t *export_counts /* [p] */,
                       int64_t *export_idx /* [p][b_ghost] */,
                       int64_t *nb_shard /* [ne][3] */,
                       int64_t *nb_slot /* [ne][3] */) {
    std::vector<std::unordered_map<int64_t, int64_t>> exp_pos(p);
    std::vector<std::vector<int64_t>> exp_list(p);
    // collect exports in deterministic (slot-sorted) order: first gather,
    // then sort
    std::vector<std::vector<int64_t>> needed(p);
    for (int64_t i = 0; i < ne; i++) {
        int64_t q = shard_of[i];
        for (int j = 0; j < 3; j++) {
            int64_t nb = nabr[i * 3 + j];
            if (nb >= 0 && shard_of[nb] != q) {
                needed[shard_of[nb]].push_back(slot_of[nb]);
            }
        }
    }
    for (int64_t q = 0; q < p; q++) {
        auto &v = needed[q];
        std::sort(v.begin(), v.end());
        v.erase(std::unique(v.begin(), v.end()), v.end());
        export_counts[q] = (int64_t)v.size();
        if (!count_only) {
            for (size_t k = 0; k < v.size(); k++) {
                export_idx[q * b_ghost + (int64_t)k] = v[k];
                exp_pos[q][v[k]] = (int64_t)k;
            }
        }
    }
    if (count_only) return;
    for (int64_t i = 0; i < ne; i++) {
        int64_t q = shard_of[i];
        int64_t s = slot_of[i];
        for (int j = 0; j < 3; j++) {
            int64_t nb = nabr[i * 3 + j];
            int64_t os = -1, osl = 0;
            if (nb >= 0) {
                if (shard_of[nb] == q) {
                    osl = slot_of[nb];  // local neighbour
                } else {
                    os = shard_of[nb];
                    osl = exp_pos[os][slot_of[nb]];
                }
            }
            nb_shard[i * 3 + j] = os;
            nb_slot[i * 3 + j] = osl;
        }
    }
}
}
