// Native scalar reference engine for SingleRoom semantics.
//
// A third, independent implementation of the game semantics
// (/root/reference/src/single_room.jl:110-231, collision_detection.jl,
// utils.jl, and the Lodev DDA contract) in scalar C++ — bit-compatible in
// float32 with the NumPy oracle (same operation order, no fast-math), but
// ~1000x faster than the Python loops, which makes long-trajectory parity
// sweeps (thousands of steps) practical.  PRNG-driven resets stay on the
// Python side (shared threefry streams); this library is the deterministic
// dynamics: act/collide, raycast, camera render.
//
// 0-indexed layout as in the Python package: tile (i, j) spans
// [i, i+1) x [j, j+1) world units.

#include <cmath>
#include <cstdint>

namespace {

inline bool is_colliding(const uint8_t* map, int h, int w,
                         float px, float py, float radius) {
    // 3x3 neighborhood circle-vs-unit-AABB scan
    // (ref collision_detection.jl:21-42).
    int ti = static_cast<int>(std::floor(px));
    int tj = static_cast<int>(std::floor(py));
    for (int j = tj - 1; j <= tj + 1; ++j) {
        for (int i = ti - 1; i <= ti + 1; ++i) {
            int ci = i < 0 ? 0 : (i >= h ? h - 1 : i);
            int cj = j < 0 ? 0 : (j >= w ? w - 1 : j);
            if (!map[ci * w + cj]) continue;
            float cx = static_cast<float>(i) + 0.5f;
            float cy = static_cast<float>(j) + 0.5f;
            float rx = px - cx;
            float ry = py - cy;
            float qx = rx < -0.5f ? -0.5f : (rx > 0.5f ? 0.5f : rx);
            float qy = ry < -0.5f ? -0.5f : (ry > 0.5f ? 0.5f : ry);
            float dx = rx - qx;
            float dy = ry - qy;
            if (dx * dx + dy * dy < radius * radius) return true;
        }
    }
    return false;
}

}  // namespace

extern "C" {

// One action on one env (ref act!, single_room.jl:139-191).
// pos/dir_au/reward/done are in-out.  Goal map is implicit (goal_i, goal_j).
void rcw_step(const uint8_t* walls, int h, int w,
              const float* dir_lut,  // [D, 2] float32 heading vectors
              int num_directions,
              float radius, float increment, float goal_reward,
              int goal_i, int goal_j,
              int action,
              float* pos, int* dir_au, float* reward, int* done) {
    if (action < 2) {
        const float* d = dir_lut + 2 * (*dir_au);
        float sign = action == 0 ? 1.0f : -1.0f;
        float cx = pos[0] + (sign * increment) * d[0];
        float cy = pos[1] + (sign * increment) * d[1];
        // goal: single-tile circle/AABB test (equivalent to the reference's
        // goal-channel scan since radius < 0.5)
        float gx = static_cast<float>(goal_i) + 0.5f;
        float gy = static_cast<float>(goal_j) + 0.5f;
        float rx = cx - gx, ry = cy - gy;
        float qx = rx < -0.5f ? -0.5f : (rx > 0.5f ? 0.5f : rx);
        float qy = ry < -0.5f ? -0.5f : (ry > 0.5f ? 0.5f : ry);
        float ddx = rx - qx, ddy = ry - qy;
        bool hit_goal = ddx * ddx + ddy * ddy < radius * radius;
        bool hit_wall = is_colliding(walls, h, w, cx, cy, radius);
        if (hit_goal) {
            *reward = goal_reward;
            *done = 1;
        } else if (hit_wall) {
            *reward = 0.0f;
            *done = 0;
        } else {
            pos[0] = cx;
            pos[1] = cy;
            *reward = 0.0f;
            *done = 0;
        }
    } else {
        int turn = action == 2 ? 1 : -1;
        int d = (*dir_au + turn) % num_directions;
        if (d < 0) d += num_directions;
        *dir_au = d;
        *reward = 0.0f;
        *done = 0;
    }
}

// DDA march for R rays (Lodev; contract of RayCaster.cast_ray at
// /root/reference/src/single_room.jl:223-227).
void rcw_cast(const uint8_t* obstacle, int h, int w,
              const float* fan,  // [R, 2] normalized ray dirs
              int num_rays, float px, float py, int max_steps,
              int* hit_i, int* hit_j, int* hit_dim, float* dist) {
    for (int r = 0; r < num_rays; ++r) {
        float dx = fan[2 * r];
        float dy = fan[2 * r + 1];
        int map_i = static_cast<int>(std::floor(px));
        int map_j = static_cast<int>(std::floor(py));
        float delta_i = dx != 0.0f ? std::fabs(1.0f / dx) : INFINITY;
        float delta_j = dy != 0.0f ? std::fabs(1.0f / dy) : INFINITY;
        int step_i = dx < 0.0f ? -1 : 1;
        int step_j = dy < 0.0f ? -1 : 1;
        float frac_i = px - std::floor(px);
        float frac_j = py - std::floor(py);
        float side_i = (dx < 0.0f ? frac_i : 1.0f - frac_i) * delta_i;
        float side_j = (dy < 0.0f ? frac_j : 1.0f - frac_j) * delta_j;
        float d = 3.4028234663852886e38f;  // float32 max sentinel
        int dim = 1;
        bool hit = false;
        for (int s = 0; s < max_steps && !hit; ++s) {
            if (side_i < side_j) {
                d = side_i;
                side_i += delta_i;
                map_i += step_i;
                dim = 0;
            } else {
                d = side_j;
                side_j += delta_j;
                map_j += step_j;
                dim = 1;
            }
            int ci = map_i < 0 ? 0 : (map_i >= h ? h - 1 : map_i);
            int cj = map_j < 0 ? 0 : (map_j >= w ? w - 1 : map_j);
            hit = obstacle[ci * w + cj] != 0;
        }
        hit_i[r] = map_i;
        hit_j[r] = map_j;
        hit_dim[r] = dim;
        dist[r] = hit ? d : 3.4028234663852886e38f;
    }
}

// Parallel-crossing raycast (mirror of ops/raycast.cast_rays_crossing and
// oracle cast_one_crossing): the hit is the min distance over all grid-line
// crossings whose entered tile is occupied; distances are the closed form
// side0 + k*delta.  Must be compiled with -ffp-contract=off so the float32
// mul-then-add sequence matches the Python implementations exactly.
void rcw_cast_crossing(const uint8_t* obstacle, int h, int w,
                       const float* fan, int num_rays, float px, float py,
                       int* hit_i, int* hit_j, int* hit_dim, float* dist) {
    const float big = 3.4028234663852886e38f;
    for (int r = 0; r < num_rays; ++r) {
        float dxy[2] = {fan[2 * r], fan[2 * r + 1]};
        float pxy[2] = {px, py};
        float best[2];
        int mbest[2], cbest[2];
        for (int axis = 0; axis < 2; ++axis) {
            bool main_is_i = axis == 0;
            float d_main = dxy[axis];
            float d_cross = dxy[1 - axis];
            float p_main = pxy[axis];
            float p_cross = pxy[1 - axis];
            int n = main_is_i ? h : w;
            int size_cross = main_is_i ? w : h;
            int main0 = static_cast<int>(std::floor(p_main));
            int step = d_main < 0.0f ? -1 : 1;
            float frac = p_main - std::floor(p_main);
            float frac_sel = d_main < 0.0f ? frac : 1.0f - frac;
            float ad = std::fabs(d_main);
            float b = big;
            int kb = 0, cb = 0;
            for (int k = 0; k < n; ++k) {
                // add-then-divide (matches the JAX and NumPy mirrors; no
                // contractible mul+add pattern).  ad == 0 -> inf/NaN,
                // rejected by the isfinite mask below.
                float t = (frac_sel + static_cast<float>(k)) / ad;
                bool finite = std::isfinite(t);
                float c = finite ? (p_cross + t * d_cross) : 0.0f;
                float c_tile;
                // Tie rules of the sequential march: at an i-crossing the
                // simultaneous j-crossing has already advanced (<=); at a
                // j-crossing the simultaneous i-crossing has not (<).
                if (main_is_i) {
                    // d_cross == 0 -> floor, matching the scan's map_j0
                    c_tile = d_cross >= 0.0f ? std::floor(c)
                                             : std::ceil(c) - 1.0f;
                } else {
                    c_tile = d_cross > 0.0f ? std::ceil(c) - 1.0f
                                            : std::floor(c);
                }
                float hi = static_cast<float>(size_cross - 1);
                float cc = c_tile < 0.0f ? 0.0f : (c_tile > hi ? hi : c_tile);
                int c_id = static_cast<int>(cc);
                int m_id = main0 + (k + 1) * step;
                int mc = m_id < 0 ? 0 : (m_id >= n ? n - 1 : m_id);
                bool occ = finite &&
                           (main_is_i ? obstacle[mc * w + c_id]
                                      : obstacle[c_id * w + mc]) != 0;
                if (k == 0) cb = c_id;
                float tm = occ ? t : big;
                if (tm < b) {
                    b = tm;
                    kb = k;
                    cb = c_id;
                }
            }
            best[axis] = b;
            mbest[axis] = main0 + (kb + 1) * step;
            cbest[axis] = cb;
        }
        if (best[1] <= best[0]) {  // ties check j first
            hit_i[r] = cbest[1];
            hit_j[r] = mbest[1];
            hit_dim[r] = 1;
            dist[r] = best[1];
        } else {
            hit_i[r] = mbest[0];
            hit_j[r] = cbest[0];
            hit_dim[r] = 0;
            dist[r] = best[0];
        }
    }
}

// Camera-view render (ref update_camera_view!, single_room.jl:374-444).
// Palette passed in so it lives in one place (Python colors.py).
void rcw_render_camera(const uint8_t* walls, int h, int w,
                        const float* fan, int num_rays,
                        const float* player_dir,
                        const int* hit_i, const int* hit_j,
                        const int* hit_dim, const float* dist,
                        int hpu, float num_c, float denom_c,
                        uint32_t ceiling, uint32_t floor_c,
                        uint32_t wall_dim_i, uint32_t wall_dim_j,
                        uint32_t goal_dim_i, uint32_t goal_dim_j,
                        uint32_t* img) {
    for (int r = 0; r < num_rays; ++r) {
        float proj = dist[r] * (player_dir[0] * fan[2 * r] +
                                player_dir[1] * fan[2 * r + 1]);
        float height_line = num_c / (denom_c * proj);
        int h_pu;
        if (std::isfinite(height_line)) {
            float clamped = height_line < static_cast<float>(hpu)
                                ? height_line
                                : static_cast<float>(hpu);
            h_pu = static_cast<int>(std::floor(clamped));
        } else {
            h_pu = hpu;
        }
        uint32_t color;
        int ci = hit_i[r] < 0 ? 0 : (hit_i[r] >= h ? h - 1 : hit_i[r]);
        int cj = hit_j[r] < 0 ? 0 : (hit_j[r] >= w ? w - 1 : hit_j[r]);
        if (walls[ci * w + cj]) {
            color = hit_dim[r] == 0 ? wall_dim_i : wall_dim_j;
        } else {
            color = hit_dim[r] == 0 ? goal_dim_i : goal_dim_j;
        }
        int k = num_rays - 1 - r;  // mirrored column
        if (h_pu >= hpu - 1) {
            for (int y = 0; y < hpu; ++y) img[y * num_rays + k] = color;
        } else {
            int pad = (hpu - h_pu) / 2;
            for (int y = 0; y < pad; ++y) img[y * num_rays + k] = ceiling;
            for (int y = pad; y < hpu - pad; ++y) img[y * num_rays + k] = color;
            for (int y = hpu - pad; y < hpu; ++y) img[y * num_rays + k] = floor_c;
        }
    }
}

}  // extern "C"
