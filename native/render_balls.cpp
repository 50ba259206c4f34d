// Z-buffered ball-splat renderer for the interactive point-cloud viewer.
//
// Behavioral reference: /root/reference/pointnet2/utils/render_balls_so.cpp:14
// (render_ball): for each point, splat a disk of the given radius using a
// z-buffer so nearer points win; the disk offset table is built per call.
// Fresh implementation with the same C ABI contract so the viewer can ctypes
// into it.
//
// Build: `make` in this directory.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// show: [h, w, 3] uint8 image (pre-zeroed or reused), xyzs: [n, 3] int32
// screen-space coords (x, y, depth), c0/c1/c2: per-point color channels,
// r: ball radius in pixels.
void render_ball(int h, int w, uint8_t* show, int n, const int32_t* xyzs,
                 const float* c0, const float* c1, const float* c2, int r) {
  r = std::max(r, 1);
  std::vector<int32_t> depth((size_t)h * w, -2100000000);

  // Precompute the disk offsets and a depth bonus so sphere shading is
  // consistent (points closer to disk center read as nearer).
  std::vector<int> dx, dy, dz;
  for (int i = -r; i <= r; ++i) {
    for (int j = -r; j <= r; ++j) {
      const int q = i * i + j * j;
      if (q < r * r) {
        dx.push_back(i);
        dy.push_back(j);
        dz.push_back(r * r - q);
      }
    }
  }

  for (int i = 0; i < n; ++i) {
    const int x = xyzs[i * 3 + 0];
    const int y = xyzs[i * 3 + 1];
    const int z = xyzs[i * 3 + 2];
    for (size_t k = 0; k < dx.size(); ++k) {
      const int xx = x + dx[k];
      const int yy = y + dy[k];
      if (xx < 0 || xx >= h || yy < 0 || yy >= w) continue;
      const size_t pix = (size_t)xx * w + yy;
      const int32_t zz = z + dz[k];
      if (zz > depth[pix]) {
        depth[pix] = zz;
        show[pix * 3 + 0] = (uint8_t)std::min(255.0f, std::max(0.0f, c0[i] * 255.0f));
        show[pix * 3 + 1] = (uint8_t)std::min(255.0f, std::max(0.0f, c1[i] * 255.0f));
        show[pix * 3 + 2] = (uint8_t)std::min(255.0f, std::max(0.0f, c2[i] * 255.0f));
      }
    }
  }
}

}  // extern "C"
