// houv_tpu native data loader.
//
// TPU-native replacement for the host-side data path of the reference:
// torch DataLoader worker processes doing per-sample numpy pose synthesis
// (registration/dataset.py:125-130) and voxelization (completion/
// dataset.py:126-142) on CPU. Here a pool of C++ threads fills a ring
// buffer of fully-formed batches (pose synthesis, jitter, voxel indices
// all computed natively), so the accelerator never waits on Python.
//
// Exposed as a plain C ABI consumed via ctypes (houv_tpu/data/native_loader.py).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Pose {
  float r[9];
  float t[3];
};

// Uniform-axis random rotation + bounded random translation — matches the
// reference's random_pose/random_rotation/random_translation
// (registration/dataset.py:16-53).
Pose random_pose(std::mt19937_64 &rng, float max_angle, float max_trans,
                 float min_angle = 0.f) {
  std::normal_distribution<float> gauss(0.f, 1.f);
  std::uniform_real_distribution<float> unif(0.f, 1.f);
  float ax = gauss(rng), ay = gauss(rng), az = gauss(rng);
  float norm = std::sqrt(ax * ax + ay * ay + az * az) + 1e-12f;
  ax /= norm; ay /= norm; az /= norm;
  float angle = min_angle + unif(rng) * (max_angle - min_angle);
  float c = std::cos(angle), s = std::sin(angle), omc = 1.f - c;

  Pose p;
  // Rodrigues for unit axis (ax, ay, az).
  p.r[0] = c + ax * ax * omc;      p.r[1] = ax * ay * omc - az * s; p.r[2] = ax * az * omc + ay * s;
  p.r[3] = ay * ax * omc + az * s; p.r[4] = c + ay * ay * omc;      p.r[5] = ay * az * omc - ax * s;
  p.r[6] = az * ax * omc - ay * s; p.r[7] = az * ay * omc + ax * s; p.r[8] = c + az * az * omc;

  float tx = gauss(rng), ty = gauss(rng), tz = gauss(rng);
  float tn = std::sqrt(tx * tx + ty * ty + tz * tz) + 1e-12f;
  float scale = unif(rng) * max_trans / tn;
  p.t[0] = tx * scale; p.t[1] = ty * scale; p.t[2] = tz * scale;
  return p;
}

Pose compose(const Pose &a, const Pose &b) {  // a ∘ b
  Pose o;
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) {
      float acc = 0.f;
      for (int k = 0; k < 3; ++k) acc += a.r[i * 3 + k] * b.r[k * 3 + j];
      o.r[i * 3 + j] = acc;
    }
    o.t[i] = a.t[i];
    for (int k = 0; k < 3; ++k) o.t[i] += a.r[i * 3 + k] * b.t[k];
  }
  return o;
}

void apply_pose(const Pose &p, const float *in, float *out, int n) {
  for (int i = 0; i < n; ++i) {
    const float *q = in + 3 * i;
    float x = q[0], y = q[1], z = q[2];
    out[3 * i + 0] = p.r[0] * x + p.r[1] * y + p.r[2] * z + p.t[0];
    out[3 * i + 1] = p.r[3] * x + p.r[4] * y + p.r[5] * z + p.t[1];
    out[3 * i + 2] = p.r[6] * x + p.r[7] * y + p.r[8] * z + p.t[2];
  }
}

// Voxel indices with the reference's grid convention
// (completion/dataset.py:126-142): intervals = range/(G-1).
void voxelize(const float *pts, int32_t *out, int n, int grid,
              float min_b, float max_b) {
  float interval = (max_b - min_b) / float(grid - 1);
  for (int i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      float v = pts[3 * i + c];
      v = v < min_b ? min_b : (v > max_b ? max_b : v);
      int idx = int(std::floor((v - min_b) / interval));
      if (idx < 0) idx = 0;
      if (idx >= grid) idx = grid - 1;
      out[3 * i + c] = idx;
    }
  }
}

struct Batch {
  std::vector<float> src, tgt, transform;
  std::vector<int32_t> coords;
};

struct Loader {
  // dataset views (owned by the caller / numpy)
  const float *src_data;
  const float *tgt_data;
  int64_t n_samples;
  int n_points;
  int batch_size;
  float max_angle;   // radians
  float max_trans;
  int with_voxels;
  int grid_size;
  float jitter_sigma;  // 0 = off
  uint64_t seed;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::queue<Batch> ready;
  size_t capacity;
  std::atomic<bool> stop{false};
  std::atomic<uint64_t> batch_counter{0};

  void worker(int wid) {
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + wid + 1);
    std::uniform_int_distribution<int64_t> pick(0, n_samples - 1);
    std::normal_distribution<float> gauss(0.f, 1.f);
    const int np = n_points;
    while (!stop.load()) {
      Batch b;
      b.src.resize(size_t(batch_size) * np * 3);
      b.tgt.resize(size_t(batch_size) * np * 3);
      b.transform.resize(size_t(batch_size) * 16);
      if (with_voxels) b.coords.resize(size_t(batch_size) * np * 3);

      for (int i = 0; i < batch_size; ++i) {
        int64_t idx = pick(rng);
        const float *s = src_data + idx * np * 3;
        const float *t = tgt_data + idx * np * 3;
        // transform = random_pose(max_angle, max_trans/2);
        // pose1 = random_pose(pi, max_trans); pose2 = transform ∘ pose1.
        Pose transform = random_pose(rng, max_angle, max_trans * 0.5f);
        Pose pose1 = random_pose(rng, float(M_PI), max_trans);
        Pose pose2 = compose(transform, pose1);
        float *so = b.src.data() + size_t(i) * np * 3;
        float *to = b.tgt.data() + size_t(i) * np * 3;
        apply_pose(pose1, s, so, np);
        apply_pose(pose2, t, to, np);
        if (jitter_sigma > 0.f) {
          for (int k = 0; k < np * 3; ++k) {
            float n1 = jitter_sigma * gauss(rng);
            if (n1 > 0.05f) n1 = 0.05f;
            if (n1 < -0.05f) n1 = -0.05f;
            so[k] += n1;
          }
        }
        float *tf = b.transform.data() + size_t(i) * 16;
        for (int r = 0; r < 3; ++r) {
          for (int c2 = 0; c2 < 3; ++c2) tf[r * 4 + c2] = transform.r[r * 3 + c2];
          tf[r * 4 + 3] = transform.t[r];
        }
        tf[12] = tf[13] = tf[14] = 0.f; tf[15] = 1.f;
        if (with_voxels)
          voxelize(so, b.coords.data() + size_t(i) * np * 3, np, grid_size,
                   -0.5f, 0.5f);
      }

      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] { return ready.size() < capacity || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(b));
      cv_empty.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void *loader_create(const float *src, const float *tgt, int64_t n_samples,
                    int n_points, int batch_size, int n_threads, int capacity,
                    float max_angle_rad, float max_trans, float jitter_sigma,
                    uint64_t seed, int with_voxels, int grid_size) {
  auto *l = new Loader();
  l->src_data = src;
  l->tgt_data = tgt;
  l->n_samples = n_samples;
  l->n_points = n_points;
  l->batch_size = batch_size;
  l->max_angle = max_angle_rad;
  l->max_trans = max_trans;
  l->jitter_sigma = jitter_sigma;
  l->seed = seed;
  l->with_voxels = with_voxels;
  l->grid_size = grid_size;
  l->capacity = size_t(capacity);
  for (int i = 0; i < n_threads; ++i)
    l->workers.emplace_back(&Loader::worker, l, i);
  return l;
}

// Blocks until a batch is ready; copies into caller buffers. Returns 0 on
// success, -1 if the loader is stopped.
int loader_next(void *handle, float *src_out, float *tgt_out, float *tf_out,
                int32_t *coords_out) {
  auto *l = static_cast<Loader *>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_empty.wait(lk, [&] { return !l->ready.empty() || l->stop.load(); });
    if (l->ready.empty()) return -1;
    b = std::move(l->ready.front());
    l->ready.pop();
    l->cv_full.notify_one();
  }
  std::memcpy(src_out, b.src.data(), b.src.size() * sizeof(float));
  std::memcpy(tgt_out, b.tgt.data(), b.tgt.size() * sizeof(float));
  std::memcpy(tf_out, b.transform.data(), b.transform.size() * sizeof(float));
  if (l->with_voxels && coords_out)
    std::memcpy(coords_out, b.coords.data(),
                b.coords.size() * sizeof(int32_t));
  return 0;
}

int64_t loader_queue_size(void *handle) {
  auto *l = static_cast<Loader *>(handle);
  std::lock_guard<std::mutex> lk(l->mu);
  return int64_t(l->ready.size());
}

void loader_destroy(void *handle) {
  auto *l = static_cast<Loader *>(handle);
  l->stop.store(true);
  l->cv_full.notify_all();
  l->cv_empty.notify_all();
  for (auto &t : l->workers) t.join();
  delete l;
}

}  // extern "C"
