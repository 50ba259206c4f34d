// CPU reference kernels for the point-cloud ops, exposed over a C ABI for
// ctypes.  These mirror the reference's native kernel semantics
// (/root/reference/pointnet2/tf_ops/*: tf_sampling_g.cu FPS,
// tf_grouping_g.cu ball query / grouping / selection sort,
// tf_interpolate.cpp three_nn / three_interpolate, and the standalone CPU
// bench implementations in pointnet2/tf_ops/grouping/test/) and serve two
// purposes in the TPU framework:
//   1. an independent golden oracle for parity-testing the lax/Pallas ops
//      (beyond the in-repo numpy goldens), and
//   2. a fast host-side fallback for CPU-only data tooling.
//
// Build: `make` in this directory (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// Farthest point sampling.  Deterministic seed: index 0 per cloud; squared
// distances; ties resolve to the lowest index (matches tf_sampling_g.cu
// argmax-reduction semantics and jnp.argmax).
void fps(const float* xyz, int b, int n, int npoint, int32_t* idx) {
  std::vector<float> temp(n);
  for (int i = 0; i < b; ++i) {
    const float* cloud = xyz + (int64_t)i * n * 3;
    int32_t* out = idx + (int64_t)i * npoint;
    std::fill(temp.begin(), temp.end(), 1e38f);
    int old = 0;
    out[0] = 0;
    for (int j = 1; j < npoint; ++j) {
      float best = -1.0f;
      int besti = 0;
      const float x1 = cloud[old * 3 + 0];
      const float y1 = cloud[old * 3 + 1];
      const float z1 = cloud[old * 3 + 2];
      for (int k = 0; k < n; ++k) {
        const float dx = cloud[k * 3 + 0] - x1;
        const float dy = cloud[k * 3 + 1] - y1;
        const float dz = cloud[k * 3 + 2] - z1;
        const float d = dx * dx + dy * dy + dz * dz;
        const float d2 = std::min(d, temp[k]);
        temp[k] = d2;
        if (d2 > best) {
          best = d2;
          besti = k;
        }
      }
      old = besti;
      out[j] = besti;
    }
  }
}

// Ball query: first `nsample` points (original order) with
// max(dist,1e-20) < radius; fill-row-on-first-hit padding; rows with zero
// hits are defined as index 0 (the CUDA kernel leaves them uninitialized).
void query_ball_point(const float* xyz1, const float* xyz2, int b, int n,
                      int m, float radius, int nsample, int32_t* idx,
                      int32_t* pts_cnt) {
  for (int i = 0; i < b; ++i) {
    const float* pts = xyz1 + (int64_t)i * n * 3;
    const float* qrs = xyz2 + (int64_t)i * m * 3;
    for (int j = 0; j < m; ++j) {
      int32_t* row = idx + ((int64_t)i * m + j) * nsample;
      std::memset(row, 0, sizeof(int32_t) * nsample);
      int cnt = 0;
      const float x2 = qrs[j * 3 + 0], y2 = qrs[j * 3 + 1], z2 = qrs[j * 3 + 2];
      for (int k = 0; k < n && cnt < nsample; ++k) {
        const float dx = x2 - pts[k * 3 + 0];
        const float dy = y2 - pts[k * 3 + 1];
        const float dz = z2 - pts[k * 3 + 2];
        const float d =
            std::max(std::sqrt(dx * dx + dy * dy + dz * dz), 1e-20f);
        if (d < radius) {
          if (cnt == 0)
            for (int l = 0; l < nsample; ++l) row[l] = k;
          row[cnt++] = k;
        }
      }
      pts_cnt[(int64_t)i * m + j] = cnt;
    }
  }
}

// Grouped gather (tf_grouping_g.cu:40-57).
void group_point(const float* points, const int32_t* idx, int b, int n, int c,
                 int m, int nsample, float* out) {
  for (int i = 0; i < b; ++i) {
    const float* pts = points + (int64_t)i * n * c;
    for (int j = 0; j < m; ++j) {
      for (int k = 0; k < nsample; ++k) {
        const int32_t ii = idx[((int64_t)i * m + j) * nsample + k];
        std::memcpy(out + (((int64_t)i * m + j) * nsample + k) * c,
                    pts + (int64_t)ii * c, sizeof(float) * c);
      }
    }
  }
}

// Gradient of group_point: scatter-add (tf_grouping_g.cu:61-78).
void group_point_grad(const float* grad_out, const int32_t* idx, int b, int n,
                      int c, int m, int nsample, float* grad_points) {
  std::memset(grad_points, 0, sizeof(float) * (int64_t)b * n * c);
  for (int i = 0; i < b; ++i) {
    for (int j = 0; j < m; ++j) {
      for (int k = 0; k < nsample; ++k) {
        const int32_t ii = idx[((int64_t)i * m + j) * nsample + k];
        const float* g = grad_out + (((int64_t)i * m + j) * nsample + k) * c;
        float* gp = grad_points + ((int64_t)i * n + ii) * c;
        for (int l = 0; l < c; ++l) gp[l] += g[l];
      }
    }
  }
}

// Partial selection sort: k smallest squared distances per row, ascending,
// ties to the lowest index (tf_grouping_g.cu:83-123 semantics).
void selection_sort_knn(const float* dist, int b, int m, int n, int k,
                        float* out_dist, int32_t* out_idx) {
  std::vector<float> buf(n);
  std::vector<int32_t> ord(n);
  for (int i = 0; i < b; ++i) {
    for (int j = 0; j < m; ++j) {
      const float* row = dist + ((int64_t)i * m + j) * n;
      std::memcpy(buf.data(), row, sizeof(float) * n);
      for (int t = 0; t < n; ++t) ord[t] = t;
      for (int s = 0; s < k; ++s) {
        int minp = s;
        for (int t = s + 1; t < n; ++t)
          if (buf[t] < buf[minp]) minp = t;
        std::swap(buf[s], buf[minp]);
        std::swap(ord[s], ord[minp]);
        out_dist[((int64_t)i * m + j) * k + s] = buf[s];
        out_idx[((int64_t)i * m + j) * k + s] = ord[s];
      }
    }
  }
}

// three_nn: squared distances + indices of the 3 nearest known points,
// slots beyond the candidate count stay at 1e40/index 0
// (tf_interpolate.cpp:57-80).
void three_nn(const float* xyz1, const float* xyz2, int b, int n, int m,
              float* dist, int32_t* idx) {
  for (int i = 0; i < b; ++i) {
    const float* q = xyz1 + (int64_t)i * n * 3;
    const float* p = xyz2 + (int64_t)i * m * 3;
    for (int j = 0; j < n; ++j) {
      float best1 = 1e40f, best2 = 1e40f, best3 = 1e40f;
      int besti1 = 0, besti2 = 0, besti3 = 0;
      const float x1 = q[j * 3 + 0], y1 = q[j * 3 + 1], z1 = q[j * 3 + 2];
      for (int k = 0; k < m; ++k) {
        const float dx = x1 - p[k * 3 + 0];
        const float dy = y1 - p[k * 3 + 1];
        const float dz = z1 - p[k * 3 + 2];
        const float d = dx * dx + dy * dy + dz * dz;
        if (d < best1) {
          best3 = best2; besti3 = besti2;
          best2 = best1; besti2 = besti1;
          best1 = d; besti1 = k;
        } else if (d < best2) {
          best3 = best2; besti3 = besti2;
          best2 = d; besti2 = k;
        } else if (d < best3) {
          best3 = d; besti3 = k;
        }
      }
      float* drow = dist + ((int64_t)i * n + j) * 3;
      int32_t* irow = idx + ((int64_t)i * n + j) * 3;
      drow[0] = best1; drow[1] = best2; drow[2] = best3;
      irow[0] = besti1; irow[1] = besti2; irow[2] = besti3;
    }
  }
}

// three_interpolate (tf_interpolate.cpp:82-130).
void three_interpolate(const float* points, const int32_t* idx,
                       const float* weight, int b, int m, int c, int n,
                       float* out) {
  for (int i = 0; i < b; ++i) {
    const float* pts = points + (int64_t)i * m * c;
    for (int j = 0; j < n; ++j) {
      const int32_t* irow = idx + ((int64_t)i * n + j) * 3;
      const float* wrow = weight + ((int64_t)i * n + j) * 3;
      float* orow = out + ((int64_t)i * n + j) * c;
      for (int l = 0; l < c; ++l) {
        orow[l] = wrow[0] * pts[(int64_t)irow[0] * c + l] +
                  wrow[1] * pts[(int64_t)irow[1] * c + l] +
                  wrow[2] * pts[(int64_t)irow[2] * c + l];
      }
    }
  }
}

}  // extern "C"
