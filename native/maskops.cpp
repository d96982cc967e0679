// maskops — native host-side mask utilities for revisit_anything_tpu.
//
// The reference relies on third-party native code for these (torch RLE ops,
// cv2.connectedComponentsWithStats in the AMG postprocessor
// sam/segment_anything/utils/amg.py:107-146,:267-300, torchvision NMS).
// Here they are first-party C++: column-major RLE (SAM's uncompressed RLE
// convention), 8-connectivity union-find components, greedy box NMS.
//
// Built as a plain shared library; Python binds via ctypes
// (revisit_anything_tpu/native.py), numpy fallbacks when unavailable.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Column-major (Fortran) RLE encode, counts alternating 0-runs/1-runs,
// starting with the 0 count (mask_to_rle_pytorch semantics).
// Returns number of counts written (<= h*w + 1).
int rle_encode(const uint8_t* mask, int h, int w, int32_t* counts_out) {
    int n = 0;
    int64_t run = 0;
    uint8_t cur = 0;
    for (int x = 0; x < w; ++x) {
        for (int y = 0; y < h; ++y) {
            uint8_t v = mask[(int64_t)y * w + x] != 0;
            if (v == cur) {
                ++run;
            } else {
                counts_out[n++] = (int32_t)run;
                cur = v;
                run = 1;
            }
        }
    }
    counts_out[n++] = (int32_t)run;
    return n;
}

// Inverse of rle_encode.
void rle_decode(const int32_t* counts, int n, int h, int w, uint8_t* out) {
    // bounds-checked: a corrupted artifact whose counts sum past h*w must
    // not write outside the caller's buffer
    const int64_t total = (int64_t)h * w;
    int64_t idx = 0;
    uint8_t cur = 0;
    for (int i = 0; i < n; ++i) {
        for (int32_t r = 0; r < counts[i] && idx < total; ++r) {
            int64_t x = idx / h, y = idx % h;
            out[y * w + x] = cur;
            ++idx;
        }
        cur ^= 1;
    }
}

namespace {
struct UF {
    std::vector<int32_t> parent;
    explicit UF(int n) : parent(n) {
        for (int i = 0; i < n; ++i) parent[i] = i;
    }
    int find(int a) {
        while (parent[a] != a) {
            parent[a] = parent[parent[a]];
            a = parent[a];
        }
        return a;
    }
    void unite(int a, int b) {
        a = find(a); b = find(b);
        if (a != b) parent[b] = a;
    }
};
}  // namespace

// 8-connectivity connected components. labels_out gets labels 1..n_comps
// (0 = background). Returns component count (excluding background).
// areas_out (optional, size >= h*w) receives per-label areas at [label].
int connected_components(const uint8_t* mask, int h, int w,
                         int32_t* labels_out, int32_t* areas_out) {
    const int64_t n = (int64_t)h * w;
    UF uf((int)n);
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            int64_t i = (int64_t)y * w + x;
            if (!mask[i]) continue;
            // union with already-visited neighbors (W, NW, N, NE)
            if (x > 0 && mask[i - 1]) uf.unite((int)i, (int)(i - 1));
            if (y > 0) {
                int64_t up = i - w;
                if (mask[up]) uf.unite((int)i, (int)up);
                if (x > 0 && mask[up - 1]) uf.unite((int)i, (int)(up - 1));
                if (x < w - 1 && mask[up + 1]) uf.unite((int)i, (int)(up + 1));
            }
        }
    }
    std::vector<int32_t> root_label(n, 0);
    int next = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!mask[i]) { labels_out[i] = 0; continue; }
        int r = uf.find((int)i);
        if (root_label[r] == 0) root_label[r] = ++next;
        labels_out[i] = root_label[r];
    }
    if (areas_out) {
        std::memset(areas_out, 0, sizeof(int32_t) * (next + 1));
        for (int64_t i = 0; i < n; ++i)
            if (labels_out[i]) ++areas_out[labels_out[i]];
    }
    return next;
}

// remove_small_regions (amg.py:267-300): mode 0 = remove islands
// (foreground components < area_thresh), mode 1 = fill holes (background
// components < area_thresh). Returns 1 if anything changed.
int remove_small_regions(uint8_t* mask, int h, int w, int area_thresh,
                         int mode) {
    const int64_t n = (int64_t)h * w;
    std::vector<uint8_t> work(n);
    for (int64_t i = 0; i < n; ++i)
        work[i] = mode == 1 ? !mask[i] : (mask[i] != 0);
    std::vector<int32_t> labels(n), areas(n + 1);
    int comps = connected_components(work.data(), h, w, labels.data(),
                                     areas.data());
    if (mode == 0 && comps > 0) {
        // islands: if EVERY foreground component is below the threshold,
        // keep the largest one (amg.py:286-289 "If every region is below
        // threshold, keep largest"); the reference reports modified=True
        // because small regions existed.
        bool any_big = false;
        for (int l = 1; l <= comps; ++l)
            if (areas[l] >= area_thresh) { any_big = true; break; }
        if (!any_big) {
            int best = 1;
            for (int l = 2; l <= comps; ++l)
                if (areas[l] > areas[best]) best = l;
            for (int64_t i = 0; i < n; ++i)
                if (labels[i] && labels[i] != best) mask[i] = 0;
            return 1;
        }
    }
    int changed = 0;
    for (int64_t i = 0; i < n; ++i) {
        int lbl = labels[i];
        if (lbl && areas[lbl] < area_thresh) {
            mask[i] = mode == 1 ? 1 : 0;
            changed = 1;
        }
    }
    return changed;
}

// Greedy box NMS (XYXY, score-desc). keep_out receives kept indices in
// score-desc order; returns the number kept.
int nms(const float* boxes, const float* scores, int n, float iou_thresh,
        int32_t* keep_out) {
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return scores[a] > scores[b]; });
    std::vector<uint8_t> suppressed(n, 0);
    int kept = 0;
    for (int oi = 0; oi < n; ++oi) {
        int i = order[oi];
        if (suppressed[i]) continue;
        keep_out[kept++] = i;
        const float* bi = boxes + 4 * i;
        float ai = (bi[2] > bi[0] ? bi[2] - bi[0] : 0.f) *
                   (bi[3] > bi[1] ? bi[3] - bi[1] : 0.f);
        for (int oj = oi + 1; oj < n; ++oj) {
            int j = order[oj];
            if (suppressed[j]) continue;
            const float* bj = boxes + 4 * j;
            float x1 = bi[0] > bj[0] ? bi[0] : bj[0];
            float y1 = bi[1] > bj[1] ? bi[1] : bj[1];
            float x2 = bi[2] < bj[2] ? bi[2] : bj[2];
            float y2 = bi[3] < bj[3] ? bi[3] : bj[3];
            float iw = x2 > x1 ? x2 - x1 : 0.f;
            float ih = y2 > y1 ? y2 - y1 : 0.f;
            float inter = iw * ih;
            float aj = (bj[2] > bj[0] ? bj[2] - bj[0] : 0.f) *
                       (bj[3] > bj[1] ? bj[3] - bj[1] : 0.f);
            float uni = ai + aj - inter;
            if (uni > 0.f && inter / uni > iou_thresh) suppressed[j] = 1;
        }
    }
    return kept;
}

}  // extern "C"
