// Host-side pairwise IoU kernel.
//
// TPU-native-framework equivalent of the reference repo's ONLY native
// component, utils/compute_overlap.pyx (Cython -> C; SURVEY.md SS2
// "Native: IoU kernel"): compute_overlap(boxes Nx4, query_boxes Kx4) -> NxK
// float64 IoU matrix. Used by the host-side VOC-style evaluator; the
// on-device training path uses the vectorised JAX IoU instead
// (efficientdet_tpu/anchors.py).
//
// Built as a plain shared library (no pybind11 offline) and loaded via
// ctypes (efficientdet_tpu/evaluation/host_overlap.py). Boxes are
// [x1, y1, x2, y2]; areas use the +1 convention OFF (continuous boxes),
// matching the JAX implementation and modern COCO semantics.

#include <algorithm>
#include <cstdint>

extern "C" {

// boxes: N*4 row-major float64; queries: K*4; out: N*K.
void compute_overlap_f64(const double* boxes, int64_t n,
                         const double* queries, int64_t k, double* out) {
  for (int64_t j = 0; j < k; ++j) {
    const double qx1 = queries[j * 4 + 0];
    const double qy1 = queries[j * 4 + 1];
    const double qx2 = queries[j * 4 + 2];
    const double qy2 = queries[j * 4 + 3];
    const double q_area = std::max(0.0, qx2 - qx1) * std::max(0.0, qy2 - qy1);
    for (int64_t i = 0; i < n; ++i) {
      const double bx1 = boxes[i * 4 + 0];
      const double by1 = boxes[i * 4 + 1];
      const double bx2 = boxes[i * 4 + 2];
      const double by2 = boxes[i * 4 + 3];
      const double iw = std::min(bx2, qx2) - std::max(bx1, qx1);
      double iou = 0.0;
      if (iw > 0) {
        const double ih = std::min(by2, qy2) - std::max(by1, qy1);
        if (ih > 0) {
          const double b_area =
              std::max(0.0, bx2 - bx1) * std::max(0.0, by2 - by1);
          const double ua = b_area + q_area - iw * ih;
          if (ua > 0) iou = iw * ih / ua;
        }
      }
      out[i * k + j] = iou;
    }
  }
}

}  // extern "C"
