// Connected-components heatmap decoder (host-side, exact reference rule).
//
// Decodes batches of (H, W) float heatmaps: threshold -> 8-connectivity
// connected-component labeling (union-find over row spans) -> bounding box
// per component -> pick the component with the LARGEST BBOX AREA (the
// reference's cv2.findContours + boundingRect + max-area rule,
// /root/reference/test.py:52-79) -> integer center (x + w/2, y + h/2,
// truncating) and confidence = max probability inside the chosen bbox.
//
// This is the host/native half of the decode path: the TPU decoder
// (tracknetv3_tpu/ops/detect.py) picks the argmax-containing blob; this
// library provides the bit-exact reference semantics for evaluation and
// A/B parity checks, replacing the OpenCV dependency of the reference.
// Frames are processed in parallel with a small thread pool.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t make() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return parent.back();
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

struct Box {
  int32_t xmin = 1 << 30, ymin = 1 << 30, xmax = -1, ymax = -1;
  void add(int32_t x, int32_t y) {
    xmin = std::min(xmin, x);
    xmax = std::max(xmax, x);
    ymin = std::min(ymin, y);
    ymax = std::max(ymax, y);
  }
  void merge(const Box& o) {
    xmin = std::min(xmin, o.xmin);
    xmax = std::max(xmax, o.xmax);
    ymin = std::min(ymin, o.ymin);
    ymax = std::max(ymax, o.ymax);
  }
  int64_t area() const {
    return static_cast<int64_t>(xmax - xmin + 1) * (ymax - ymin + 1);
  }
};

void decode_one(const float* probs, int h, int w, float threshold,
                int32_t* out_bbox, float* out_conf, int32_t* out_center) {
  // Row-span based CCL: collect [start, end) spans of above-threshold
  // pixels per row, union spans that touch (8-connectivity: overlap or
  // diagonal adjacency with the previous row).
  struct Span {
    int32_t start, end, label;
  };
  UnionFind uf;
  std::vector<Span> prev_spans, cur_spans;
  std::vector<Box> boxes;  // indexed by label

  for (int y = 0; y < h; ++y) {
    cur_spans.clear();
    const float* row = probs + static_cast<int64_t>(y) * w;
    int x = 0;
    while (x < w) {
      if (row[x] > threshold) {
        int s = x;
        while (x < w && row[x] > threshold) ++x;
        cur_spans.push_back({s, x, -1});
      } else {
        ++x;
      }
    }
    for (auto& sp : cur_spans) {
      // 8-connectivity touch test between half-open spans on adjacent
      // rows: [pv.start, pv.end) and [sp.start, sp.end) expanded by one
      // pixel for diagonal contact -> pv.start <= sp.end && pv.end >=
      // sp.start.
      for (const auto& pv : prev_spans) {
        if (pv.start <= sp.end && pv.end >= sp.start) {
          if (sp.label < 0)
            sp.label = uf.find(pv.label);
          else
            uf.unite(sp.label, pv.label);
        }
      }
      if (sp.label < 0) {
        sp.label = uf.make();
        boxes.emplace_back();
      }
      Box& b = boxes[uf.find(sp.label)];
      b.add(sp.start, y);
      b.add(sp.end - 1, y);
    }
    prev_spans = cur_spans;
  }

  if (boxes.empty()) {
    out_bbox[0] = out_bbox[1] = out_bbox[2] = out_bbox[3] = 0;
    out_center[0] = out_center[1] = 0;
    *out_conf = 0.f;
    return;
  }

  // Merge boxes into their union-find roots.
  std::vector<Box> merged(boxes.size());
  std::vector<bool> used(boxes.size(), false);
  for (size_t i = 0; i < boxes.size(); ++i) {
    if (boxes[i].xmax < 0) continue;  // never populated (merged label)
    int32_t r = uf.find(static_cast<int32_t>(i));
    if (!used[r]) {
      merged[r] = boxes[i];
      used[r] = true;
    } else {
      merged[r].merge(boxes[i]);
    }
  }

  int64_t best_area = -1;
  Box best;
  for (size_t i = 0; i < merged.size(); ++i) {
    if (!used[i]) continue;
    int64_t a = merged[i].area();
    if (a > best_area) {
      best_area = a;
      best = merged[i];
    }
  }

  int32_t bx = best.xmin, by = best.ymin;
  int32_t bw = best.xmax - best.xmin + 1, bh = best.ymax - best.ymin + 1;
  out_bbox[0] = bx;
  out_bbox[1] = by;
  out_bbox[2] = bw;
  out_bbox[3] = bh;
  out_center[0] = bx + bw / 2;
  out_center[1] = by + bh / 2;

  float conf = 0.f;
  for (int y = by; y < by + bh; ++y) {
    const float* row = probs + static_cast<int64_t>(y) * w;
    for (int x = bx; x < bx + bw; ++x) conf = std::max(conf, row[x]);
  }
  *out_conf = conf;
}

}  // namespace

extern "C" {

// probs: n x h x w float32. Outputs: bbox n x 4 (x, y, w, h), conf n,
// center n x 2 (cx, cy). n_threads <= 0 selects hardware concurrency.
void decode_heatmaps_ccl(const float* probs, int n, int h, int w,
                         float threshold, int32_t* out_bbox, float* out_conf,
                         int32_t* out_center, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, n > 0 ? n : 1);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      decode_one(probs + static_cast<int64_t>(i) * h * w, h, w, threshold,
                 out_bbox + 4 * i, out_conf + i, out_center + 2 * i);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

}  // extern "C"
