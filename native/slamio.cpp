// slamio: native host-side runtime IO for lidar_slam_tpu.
//
// The reference delegates image IO to OpenCV's C++ imread behind Python
// (reference: modules/texture_mapping.py:118-132). This library is the
// first-party equivalent: libpng decode of the Kinect RGB (8-bit color) and
// disparity (16-bit gray) frames, plus a pthread-pool batch loader so frame
// decode overlaps with TPU compute. Exposed as a C ABI for ctypes
// (lidar_slam_tpu/utils/native.py).

#include <png.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PngImage {
  int width = 0;
  int height = 0;
  int channels = 0;
  int bit_depth = 0;
  std::vector<uint8_t> data;  // row-major, 16-bit stored big-endian by libpng
};

// rc: 0 ok, 1 open fail, 2 not png, 3 decode error
int read_png_file(const char* path, PngImage* out, bool header_only) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  uint8_t sig[8];
  if (std::fread(sig, 1, 8, fp) != 8 || png_sig_cmp(sig, 0, 8)) {
    std::fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int color_type = png_get_color_type(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);

  // normalize: palette -> rgb, gray<8 -> 8
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && out->bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  out->channels = png_get_channels(png, info);
  out->bit_depth = png_get_bit_depth(png, info);

  if (header_only) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
  }

  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->height);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// Exact KDTree — the host-side conformance oracle for the on-device
// brute-force NN (lidar_slam_tpu/ops/nn.py). The reference's correspondence
// search is scipy.spatial.KDTree (reference: modules/icp.py:40,161); this is
// the first-party equivalent, used to validate that the TPU argmin path
// returns the true nearest neighbor. Ties in squared distance resolve to the
// LOWEST point index, matching numpy argmin semantics (and ops/nn.py).
// ---------------------------------------------------------------------------

struct KdTree {
  int dims = 0;
  int n = 0;
  std::vector<float> pts;  // n * dims, row-major
  std::vector<int> order;  // permutation; subtree over order[lo, hi)

  float coord(int point, int axis) const {
    return pts[(size_t)point * dims + axis];
  }

  void build(int lo, int hi, int depth) {
    if (hi - lo <= 1) return;
    int axis = depth % dims;
    int mid = (lo + hi) / 2;
    std::nth_element(order.begin() + lo, order.begin() + mid,
                     order.begin() + hi, [&](int a, int b) {
                       float ca = coord(a, axis), cb = coord(b, axis);
                       if (ca != cb) return ca < cb;
                       return a < b;  // deterministic layout
                     });
    build(lo, mid, depth + 1);
    build(mid + 1, hi, depth + 1);
  }

  void query_range(const float* q, int lo, int hi, int depth, double* best_d2,
                   int* best_idx) const {
    if (hi <= lo) return;
    int mid = (lo + hi) / 2;
    int pivot = order[mid];
    double d2 = 0.0;
    for (int a = 0; a < dims; ++a) {
      double diff = (double)q[a] - (double)coord(pivot, a);
      d2 += diff * diff;
    }
    if (d2 < *best_d2 || (d2 == *best_d2 && pivot < *best_idx)) {
      *best_d2 = d2;
      *best_idx = pivot;
    }
    if (hi - lo == 1) return;
    int axis = depth % dims;
    double diff = (double)q[axis] - (double)coord(pivot, axis);
    int near_lo = diff < 0 ? lo : mid + 1, near_hi = diff < 0 ? mid : hi;
    int far_lo = diff < 0 ? mid + 1 : lo, far_hi = diff < 0 ? hi : mid;
    query_range(q, near_lo, near_hi, depth + 1, best_d2, best_idx);
    // prune the far side only when the splitting plane is STRICTLY farther
    // than the best: a point AT best_d2 there could have a lower index.
    if (diff * diff <= *best_d2)
      query_range(q, far_lo, far_hi, depth + 1, best_d2, best_idx);
  }
};

}  // namespace

extern "C" {

void* slamio_kdtree_build(const float* pts, int n, int dims) {
  if (n <= 0 || dims <= 0 || dims > 8) return nullptr;
  KdTree* tree = new KdTree;
  tree->dims = dims;
  tree->n = n;
  tree->pts.assign(pts, pts + (size_t)n * dims);
  tree->order.resize(n);
  for (int i = 0; i < n; ++i) tree->order[i] = i;
  tree->build(0, n, 0);
  return tree;
}

// Exact 1-NN for each query row; out_idx[i] = index into the build points,
// out_d2[i] = true squared distance (double-accumulated, rounded to f32).
void slamio_kdtree_query(void* handle, const float* queries, int nq,
                         int* out_idx, float* out_d2) {
  const KdTree* tree = static_cast<const KdTree*>(handle);
  for (int i = 0; i < nq; ++i) {
    double best_d2 = 1e300;
    int best_idx = -1;
    tree->query_range(queries + (size_t)i * tree->dims, 0, tree->n, 0,
                      &best_d2, &best_idx);
    out_idx[i] = best_idx;
    out_d2[i] = (float)best_d2;
  }
}

void slamio_kdtree_free(void* handle) {
  delete static_cast<KdTree*>(handle);
}

// ---------------------------------------------------------------------------
// Exact DBSCAN — the host-side conformance oracle for the on-device density
// filter (lidar_slam_tpu/ops/filters.py). The reference's scan filter is
// sklearn's DBSCAN (reference: modules/localization.py:216-217); this is the
// first-party equivalent: textbook index-order BFS over the <= eps
// neighborhood graph (self counted, like sklearn), O(n^2) — scans are ~1k
// points, and the oracle's job is exactness, not speed. labels[i] receives
// the cluster id (0..k-1) or -1 for noise. Returns the cluster count, or -1
// on bad arguments. Border points adopt the cluster of the first core point
// that reaches them in BFS order (sklearn semantics); noise and core-point
// partitions are algorithm-independent.
// ---------------------------------------------------------------------------

int slamio_dbscan(const float* pts, int n, int dims, float eps,
                  int min_samples, int* labels) {
  if (n < 0 || dims <= 0 || dims > 8 || eps < 0) return -1;
  const double eps2 = (double)eps * (double)eps;
  auto d2 = [&](int a, int b) {
    double s = 0.0;
    for (int k = 0; k < dims; ++k) {
      double diff = (double)pts[(size_t)a * dims + k] -
                    (double)pts[(size_t)b * dims + k];
      s += diff * diff;
    }
    return s;
  };
  std::vector<std::vector<int>> neigh(n);
  std::vector<bool> core(n, false);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j)
      if (d2(i, j) <= eps2) neigh[i].push_back(j);
    core[i] = (int)neigh[i].size() >= min_samples;
  }
  for (int i = 0; i < n; ++i) labels[i] = -1;
  int next_label = 0;
  std::vector<int> queue;
  for (int i = 0; i < n; ++i) {
    if (!core[i] || labels[i] != -1) continue;
    int lab = next_label++;
    labels[i] = lab;
    queue.assign(1, i);
    while (!queue.empty()) {
      int p = queue.back();
      queue.pop_back();
      for (int q : neigh[p]) {
        if (labels[q] != -1) continue;
        labels[q] = lab;          // border or core reached by this cluster
        if (core[q]) queue.push_back(q);
      }
    }
  }
  return next_label;
}

int slamio_read_png_info(const char* path, int* width, int* height,
                         int* channels, int* bit_depth) {
  PngImage img;
  int rc = read_png_file(path, &img, /*header_only=*/true);
  if (rc) return rc;
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

int slamio_read_png_u8(const char* path, uint8_t* out) {
  PngImage img;
  int rc = read_png_file(path, &img, false);
  if (rc) return rc;
  if (img.bit_depth != 8) return 4;
  std::memcpy(out, img.data.data(),
              (size_t)img.width * img.height * img.channels);
  return 0;
}

int slamio_read_png_u16(const char* path, uint16_t* out) {
  PngImage img;
  int rc = read_png_file(path, &img, false);
  if (rc) return rc;
  if (img.bit_depth != 16) return 4;
  size_t n = (size_t)img.width * img.height * img.channels;
  // libpng delivers 16-bit samples big-endian
  const uint8_t* src = img.data.data();
  for (size_t i = 0; i < n; ++i)
    out[i] = (uint16_t)((src[2 * i] << 8) | src[2 * i + 1]);
  return 0;
}

// Batch decode: paths packed as NUL-separated; each image decoded into its
// slot of `out` (stride bytes apart) by a thread pool. All images must share
// (width, height, channels, bit_depth). rcs[i] receives per-file status.
int slamio_read_png_batch_u16(const char** paths, int n, uint16_t* out,
                              long long stride_elems, int* rcs, int n_threads) {
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  std::mutex m;
  auto worker = [&]() {
    for (;;) {
      int i;
      {
        std::lock_guard<std::mutex> lk(m);
        if (next[0] >= n) return;
        i = next[0]++;
      }
      rcs[i] = slamio_read_png_u16(paths[i], out + (long long)i * stride_elems);
    }
  };
  int nt = n_threads > 0 ? n_threads : 1;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

int slamio_read_png_batch_u8(const char** paths, int n, uint8_t* out,
                             long long stride_elems, int* rcs, int n_threads) {
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  std::mutex m;
  auto worker = [&]() {
    for (;;) {
      int i;
      {
        std::lock_guard<std::mutex> lk(m);
        if (next[0] >= n) return;
        i = next[0]++;
      }
      rcs[i] = slamio_read_png_u8(paths[i], out + (long long)i * stride_elems);
    }
  };
  int nt = n_threads > 0 ? n_threads : 1;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
