// Native host-side runtime for multiview_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime roles the reference implements in C++ (SURVEY.md 2.1):
//  - union-find match merging (openMVG TracksBuilder core,
//    /root/reference/openMVG/tracks/tracks.hpp:59-230): irregular
//    pointer-chasing that is two orders of magnitude faster here than in
//    Python when merging millions of pairwise matches
//  - keypoint deduplication by exact (x,y) (interest_point.cc:527-556)
//  - a pthread thread-pool parallel file reader (the ThreadPool role,
//    rig_calibrator/src/thread.cc) feeding the data-loading pipeline
//
// Exposed as a plain C ABI for ctypes binding (no pybind11 dependency).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find
// ---------------------------------------------------------------------------

// Merge edges (a[i], b[i]) over n_nodes; writes the final root of every node
// into out_root. Path-halving + union by size.
void mv_union_find(int64_t n_nodes, int64_t n_edges, const int64_t* edges_a,
                   const int64_t* edges_b, int64_t* out_root) {
  std::vector<int64_t> parent(n_nodes);
  std::vector<int32_t> size(n_nodes, 1);
  for (int64_t i = 0; i < n_nodes; i++) parent[i] = i;

  auto find = [&](int64_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  };

  for (int64_t e = 0; e < n_edges; e++) {
    int64_t ra = find(edges_a[e]);
    int64_t rb = find(edges_b[e]);
    if (ra == rb) continue;
    if (size[ra] < size[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
  }
  for (int64_t i = 0; i < n_nodes; i++) out_root[i] = find(i);
}

// ---------------------------------------------------------------------------
// Keypoint dedup
// ---------------------------------------------------------------------------

// Assign a dense id to every distinct (x,y) pair (bit-exact float64 match,
// same semantics as the reference's std::map over coordinate pairs).
// xy: [n,2] float64. out_ids: [n]. Returns the number of unique keypoints;
// out_unique (capacity 2*n doubles) receives the unique coordinates in id
// order.
int64_t mv_dedup_keypoints(int64_t n, const double* xy, int64_t* out_ids,
                           double* out_unique) {
  struct Key {
    uint64_t a, b;
    bool operator==(const Key& o) const { return a == o.a && b == o.b; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      uint64_t h = k.a * 0x9e3779b97f4a7c15ULL ^ (k.b + 0x7f4a7c15u);
      h ^= h >> 29;
      h *= 0xbf58476d1ce4e5b9ULL;
      h ^= h >> 32;
      return (size_t)h;
    }
  };
  std::unordered_map<Key, int64_t, KeyHash> map;
  map.reserve((size_t)n * 2);
  int64_t next = 0;
  for (int64_t i = 0; i < n; i++) {
    Key k;
    std::memcpy(&k.a, &xy[2 * i], 8);
    std::memcpy(&k.b, &xy[2 * i + 1], 8);
    auto it = map.find(k);
    if (it == map.end()) {
      map.emplace(k, next);
      out_unique[2 * next] = xy[2 * i];
      out_unique[2 * next + 1] = xy[2 * i + 1];
      out_ids[i] = next++;
    } else {
      out_ids[i] = it->second;
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// Thread pool + parallel file reads
// ---------------------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(int n) : done_(false) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { Run(); });
  }
  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      done_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Add(std::function<void()> f) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push(std::move(f));
    }
    cv_.notify_one();
  }
  void Wait() {
    std::unique_lock<std::mutex> lk(mu_);
    idle_cv_.wait(lk, [this] { return jobs_.empty() && active_ == 0; });
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return done_ || !jobs_.empty(); });
        if (done_ && jobs_.empty()) return;
        job = std::move(jobs_.front());
        jobs_.pop();
        active_++;
      }
      job();
      {
        std::unique_lock<std::mutex> lk(mu_);
        active_--;
        if (jobs_.empty() && active_ == 0) idle_cv_.notify_all();
      }
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_, idle_cv_;
  int active_ = 0;
  bool done_;
};

// Read n_files files concurrently. paths: concatenated NUL-separated string.
// out_sizes[i] receives each file's byte count (-1 on error). When
// out_buffer is non-null it must have capacity buffer_cap; file contents are
// packed back-to-back in order at offsets out_offsets[i]. Two-phase use:
// call with out_buffer=null to get sizes, allocate, call again.
void mv_read_files(int64_t n_files, const char* paths, int64_t* out_sizes,
                   int64_t* out_offsets, uint8_t* out_buffer,
                   int64_t buffer_cap, int32_t num_threads) {
  std::vector<const char*> starts(n_files);
  const char* p = paths;
  for (int64_t i = 0; i < n_files; i++) {
    starts[i] = p;
    p += std::strlen(p) + 1;
  }

  if (out_buffer == nullptr) {
    ThreadPool pool(num_threads > 0 ? num_threads
                                    : (int)std::thread::hardware_concurrency());
    for (int64_t i = 0; i < n_files; i++) {
      pool.Add([i, &starts, out_sizes] {
        FILE* f = std::fopen(starts[i], "rb");
        if (!f) {
          out_sizes[i] = -1;
          return;
        }
        std::fseek(f, 0, SEEK_END);
        out_sizes[i] = std::ftell(f);
        std::fclose(f);
      });
    }
    pool.Wait();
    int64_t off = 0;
    for (int64_t i = 0; i < n_files; i++) {
      out_offsets[i] = off;
      if (out_sizes[i] > 0) off += out_sizes[i];
    }
    return;
  }

  ThreadPool pool(num_threads > 0 ? num_threads
                                  : (int)std::thread::hardware_concurrency());
  for (int64_t i = 0; i < n_files; i++) {
    pool.Add([i, &starts, out_sizes, out_offsets, out_buffer, buffer_cap] {
      FILE* f = std::fopen(starts[i], "rb");
      if (!f) {
        out_sizes[i] = -1;
        return;
      }
      int64_t off = out_offsets[i];
      int64_t cap = buffer_cap - off;
      int64_t want = out_sizes[i];
      if (want > cap) want = cap;
      int64_t got = (int64_t)std::fread(out_buffer + off, 1, (size_t)want, f);
      out_sizes[i] = got;
      std::fclose(f);
    });
  }
  pool.Wait();
}

}  // extern "C"
