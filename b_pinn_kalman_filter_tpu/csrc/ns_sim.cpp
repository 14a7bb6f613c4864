// Native Navier-Stokes simulator for CPU-side data generation.
//
// Same numerics as ops/ns_step.py (which itself mirrors the reference CUDA
// kernels op/ns_step_kernel.cu): central/one-sided gradients, CIP advection
// with sign-dependent upwind neighbors, pressure-gradient velocity update,
// neighbor-average pressure relaxation.  Used by the data pipeline to
// generate long synthetic NS rollouts on the host in parallel with TPU
// compute (the reference's training data came from an external CUDA
// simulation); OpenMP-parallel over rows.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC ns_sim.cpp -o libns_sim.so
// Exposed via ctypes (data/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline int clamp_reflect(int i, int n) {
  // reference clamp_x/clamp_y (ns_step_kernel.cu:77-83)
  if (i < 0) return -i;
  if (i > n - 1) return 2 * n - 2 - i;
  return i;
}

inline int sgn(float x) { return x < 0.0f ? -1 : 1; }  // sign(0) := +1

struct Field {
  const float* data;
  int h, w;
  inline float at(int y, int x) const {
    return data[clamp_reflect(y, h) * w + clamp_reflect(x, w)];
  }
};

void gradient(const float* f, float* gx, float* gy, int h, int w, float dx) {
#pragma omp parallel for
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      float dfx, dfy;
      if (x == 0)
        dfx = (f[y * w + 1] - f[y * w]) / dx;
      else if (x == w - 1)
        dfx = (f[y * w + w - 1] - f[y * w + w - 2]) / dx;
      else
        dfx = (f[y * w + x + 1] - f[y * w + x - 1]) / dx / 2;
      if (y == 0)
        dfy = (f[w + x] - f[x]) / dx;
      else if (y == h - 1)
        dfy = (f[(h - 1) * w + x] - f[(h - 2) * w + x]) / dx;
      else
        dfy = (f[(y + 1) * w + x] - f[(y - 1) * w + x]) / dx / 2;
      gx[y * w + x] = dfx;
      gy[y * w + x] = dfy;
    }
  }
}

void cip_advect(float* out, const float* dens, const float* ddx,
                const float* ddy, const float* u, const float* v, int h,
                int w, float dt, float dx) {
  Field Fd{dens, h, w}, Fdx{ddx, h, w}, Fdy{ddy, h, w};
#pragma omp parallel for
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int i = y * w + x;
      int xs = sgn(u[i]);
      int ys = sgn(v[i]);
      int xm = clamp_reflect(x - xs, w);
      int ym = clamp_reflect(y - ys, h);

      float d = dens[i];
      float d_xm = Fd.at(y, xm), d_ym = Fd.at(ym, x), d_xym = Fd.at(ym, xm);
      float tmp1 = d - d_ym - d_xm + d_xym;
      float tmp2 = d_xm - d;
      float tmp3 = d_ym - d;

      float xden = xs * dx * dx * dx;
      float yden = ys * dx * dx * dx;

      float dx_xm = Fdx.at(y, xm), dx_ym = Fdx.at(ym, x);
      float dy_xm = Fdy.at(y, xm), dy_ym = Fdy.at(ym, x);
      float ddx_c = ddx[i], ddy_c = ddy[i];

      float a = (xs * (dx_xm + ddx_c) * dx - 2.0f * (-tmp2)) / xden;
      float b = (ys * (dy_ym + ddy_c) * dx - 2.0f * (-tmp3)) / yden;
      float c = (-tmp1 - xs * (dx_ym - ddx_c) * dx) / yden;
      float dd = (-tmp1 - ys * (dy_xm - ddy_c) * dx) / xden;
      float e = (3.0f * tmp2 + xs * (dx_xm + 2.0f * ddx_c) * dx) / dx / dx;
      float ff = (3.0f * tmp3 + ys * (dy_ym + 2.0f * ddy_c) * dx) / dx / dx;
      float g = (-(dy_xm - ddy_c) + c * dx * dx) / (xs * dx);

      float X = -u[i] * dt;
      float Y = -v[i] * dt;
      out[i] = ((a * X + c * Y + e) * X + g * Y + ddx_c) * X +
               ((b * Y + dd * X + ff) * Y + ddy_c) * Y + d;
    }
  }
}

void pressure_update(float* out, const float* p, const float* u,
                     const float* v, int h, int w, float dt, float dx) {
  Field Fp{p, h, w}, Fu{u, h, w}, Fv{v, h, w};
#pragma omp parallel for
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      float aver = 0.25f * (Fp.at(y, x - 1) + Fp.at(y, x + 1) +
                            Fp.at(y - 1, x) + Fp.at(y + 1, x));
      float uxx = Fu.at(y, x + 1) - Fu.at(y, x - 1);
      float vxx = Fv.at(y, x + 1) - Fv.at(y, x - 1);
      float uyy = Fu.at(y + 1, x) - Fu.at(y - 1, x);
      float vyy = Fv.at(y + 1, x) - Fv.at(y - 1, x);
      out[y * w + x] = aver + (uxx * uxx + vyy * vyy + uyy * vxx) / 8.0f -
                       dx * (uxx + vyy) / (8.0f * dt);
    }
  }
}

}  // namespace

extern "C" {

// One full NS step on (h, w) fields, matching ops/ns_step.ns_step order:
// velocity update (pressure gradient + CIP self-advection), pressure
// relaxation, density CIP advection.  All buffers h*w floats, updated
// in place.
void ns_sim_step(float* dens, float* u, float* v, float* p, int h, int w,
                 float dt, float dx) {
  int n = h * w;
  std::vector<float> gx(n), gy(n), tmp_u(n), tmp_v(n), tmp(n);

  // velocity: non-advective pressure-gradient update
  gradient(p, gx.data(), gy.data(), h, w, dx);
  for (int i = 0; i < n; i++) {
    tmp_u[i] = u[i] - gx[i] * dt;
    tmp_v[i] = v[i] - gy[i] * dt;
  }
  // CIP self-advection of u then v by the updated field
  gradient(tmp_u.data(), gx.data(), gy.data(), h, w, dx);
  cip_advect(tmp.data(), tmp_u.data(), gx.data(), gy.data(), tmp_u.data(),
             tmp_v.data(), h, w, dt, dx);
  std::vector<float> u_out(tmp);
  gradient(tmp_v.data(), gx.data(), gy.data(), h, w, dx);
  cip_advect(tmp.data(), tmp_v.data(), gx.data(), gy.data(), tmp_u.data(),
             tmp_v.data(), h, w, dt, dx);
  std::memcpy(v, tmp.data(), n * sizeof(float));
  std::memcpy(u, u_out.data(), n * sizeof(float));

  // pressure
  pressure_update(tmp.data(), p, u, v, h, w, dt, dx);
  std::memcpy(p, tmp.data(), n * sizeof(float));

  // density
  gradient(dens, gx.data(), gy.data(), h, w, dx);
  cip_advect(tmp.data(), dens, gx.data(), gy.data(), u, v, h, w, dt, dx);
  std::memcpy(dens, tmp.data(), n * sizeof(float));
}

// Full rollout: writes n_frames frames of 6 channels (coordx, coordy, f, u,
// v, p) into out[n_frames*6*h*w], starting from the given initial fields
// and applying per-step damping (vel_damp, p_damp) for long-horizon
// stability (matches data/datasets._generate_ns_rollout).
void ns_sim_rollout(float* out, float* dens, float* u, float* v, float* p,
                    const float* coordx, const float* coordy, int n_frames,
                    int h, int w, float dt, float dx, float vel_damp,
                    float p_damp) {
  int n = h * w;
  for (int t = 0; t < n_frames; t++) {
    float* frame = out + (size_t)t * 6 * n;
    std::memcpy(frame + 0 * n, coordx, n * sizeof(float));
    std::memcpy(frame + 1 * n, coordy, n * sizeof(float));
    std::memcpy(frame + 2 * n, dens, n * sizeof(float));
    std::memcpy(frame + 3 * n, u, n * sizeof(float));
    std::memcpy(frame + 4 * n, v, n * sizeof(float));
    std::memcpy(frame + 5 * n, p, n * sizeof(float));
    ns_sim_step(dens, u, v, p, h, w, dt, dx);
    for (int i = 0; i < n; i++) {
      u[i] *= vel_damp;
      v[i] *= vel_damp;
      p[i] *= p_damp;
    }
  }
}

}  // extern "C"
