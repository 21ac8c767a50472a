// Native preprocessing kernels for shud_tpu.
//
// The compute path is JAX/XLA; this library provides the C++ runtime pieces
// around it — the O(N) sequential mesh-preprocessing passes that a Python
// loop cannot sustain at the 10M-cell scale the weak-scaling benchmarks
// target (reference counterparts: Model_Data::rmSinks at
// Model_Data.cpp:238-266 and _Element::applyNabor at Element.cpp:238-270).
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

}
