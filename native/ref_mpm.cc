// Independent single-thread C++ port of the reference MPM pipeline
// (Aakash1312/Fluid-Simulation mpm.cc + deformHeader.h) on dense arrays —
// the cross-implementation parity oracle for the JAX MPM solver, mirroring
// native/ref_cpu.cc's role for FLIP.
//
// Semantics follow the reference: half-cell-shifted quadratic-support
// kernel, mass-normalised velocity P2G with 0.1 threshold, findVolume at
// frame 0, corotated stress with exponential hardening, semi-implicit
// velocity solve (unpreconditioned CG on I + beta dt^2 H with the analytic
// force linearisation), SVD-clamped plasticity, FLIP advection with
// ceil/floor rounding.  Includes the same two stabilisers as the JAX
// implementation (hardening exponent cap, deformation-increment limiter).
//
// Usage: ref_mpm <bound> <density> <frames> [particles.f32]
//   With a particle file (P x 3 float32) prints a per-frame KE trace.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

// ----- 3x3 helpers (column-major-free: m[r][c]) -----
struct M3 { double m[3][3]; };
struct V3 { double v[3]; };

static M3 eye() { M3 r{}; r.m[0][0] = r.m[1][1] = r.m[2][2] = 1; return r; }
static M3 mul(const M3& a, const M3& b) {
  M3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      for (int k = 0; k < 3; ++k) r.m[i][j] += a.m[i][k] * b.m[k][j];
  return r;
}
static M3 tr(const M3& a) {
  M3 r;
  for (int i = 0; i < 3; ++i) for (int j = 0; j < 3; ++j) r.m[i][j] = a.m[j][i];
  return r;
}
static double det(const M3& f) {
  return f.m[0][0] * (f.m[1][1] * f.m[2][2] - f.m[1][2] * f.m[2][1])
       - f.m[0][1] * (f.m[1][0] * f.m[2][2] - f.m[1][2] * f.m[2][0])
       + f.m[0][2] * (f.m[1][0] * f.m[2][1] - f.m[1][1] * f.m[2][0]);
}
static M3 cof(const M3& f) {
  M3 c;
  c.m[0][0] = f.m[1][1]*f.m[2][2]-f.m[1][2]*f.m[2][1];
  c.m[0][1] = f.m[1][2]*f.m[2][0]-f.m[1][0]*f.m[2][2];
  c.m[0][2] = f.m[1][0]*f.m[2][1]-f.m[1][1]*f.m[2][0];
  c.m[1][0] = f.m[0][2]*f.m[2][1]-f.m[0][1]*f.m[2][2];
  c.m[1][1] = f.m[0][0]*f.m[2][2]-f.m[0][2]*f.m[2][0];
  c.m[1][2] = f.m[0][1]*f.m[2][0]-f.m[0][0]*f.m[2][1];
  c.m[2][0] = f.m[0][1]*f.m[1][2]-f.m[0][2]*f.m[1][1];
  c.m[2][1] = f.m[0][2]*f.m[1][0]-f.m[0][0]*f.m[1][2];
  c.m[2][2] = f.m[0][0]*f.m[1][1]-f.m[0][1]*f.m[1][0];
  return c;
}
// derivative of cof(F) in direction dF (product rule per entry)
static M3 dcof(const M3& f, const M3& d) {
  M3 c;
  c.m[0][0] = d.m[1][1]*f.m[2][2]+f.m[1][1]*d.m[2][2]-d.m[1][2]*f.m[2][1]-f.m[1][2]*d.m[2][1];
  c.m[0][1] = d.m[1][2]*f.m[2][0]+f.m[1][2]*d.m[2][0]-d.m[1][0]*f.m[2][2]-f.m[1][0]*d.m[2][2];
  c.m[0][2] = d.m[1][0]*f.m[2][1]+f.m[1][0]*d.m[2][1]-d.m[1][1]*f.m[2][0]-f.m[1][1]*d.m[2][0];
  c.m[1][0] = d.m[0][2]*f.m[2][1]+f.m[0][2]*d.m[2][1]-d.m[0][1]*f.m[2][2]-f.m[0][1]*d.m[2][2];
  c.m[1][1] = d.m[0][0]*f.m[2][2]+f.m[0][0]*d.m[2][2]-d.m[0][2]*f.m[2][0]-f.m[0][2]*d.m[2][0];
  c.m[1][2] = d.m[0][1]*f.m[2][0]+f.m[0][1]*d.m[2][0]-d.m[0][0]*f.m[2][1]-f.m[0][0]*d.m[2][1];
  c.m[2][0] = d.m[0][1]*f.m[1][2]+f.m[0][1]*d.m[1][2]-d.m[0][2]*f.m[1][1]-f.m[0][2]*d.m[1][1];
  c.m[2][1] = d.m[0][2]*f.m[1][0]+f.m[0][2]*d.m[1][0]-d.m[0][0]*f.m[1][2]-f.m[0][0]*d.m[1][2];
  c.m[2][2] = d.m[0][0]*f.m[1][1]+f.m[0][0]*d.m[1][1]-d.m[0][1]*f.m[1][0]-f.m[0][1]*d.m[1][0];
  return c;
}
static double ddot(const M3& a, const M3& b) {
  double s = 0;
  for (int i = 0; i < 3; ++i) for (int j = 0; j < 3; ++j) s += a.m[i][j]*b.m[i][j];
  return s;
}

// Jacobi eigen decomposition of a symmetric 3x3: A = Q diag(w) Q^T
static void sym_eig(const M3& a_in, double w[3], M3& q) {
  M3 a = a_in;
  q = eye();
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = fabs(a.m[0][1]) + fabs(a.m[0][2]) + fabs(a.m[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p)
      for (int r = p + 1; r < 3; ++r) {
        if (fabs(a.m[p][r]) < 1e-18) continue;
        double theta = (a.m[r][r] - a.m[p][p]) / (2 * a.m[p][r]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (fabs(theta) + sqrt(theta * theta + 1));
        double c = 1 / sqrt(t * t + 1), s = t * c;
        M3 g = eye();
        g.m[p][p] = c; g.m[r][r] = c; g.m[p][r] = s; g.m[r][p] = -s;
        a = mul(mul(tr(g), a), g);
        q = mul(q, g);
      }
  }
  for (int i = 0; i < 3; ++i) w[i] = a.m[i][i];
}

// SVD of F: F = U diag(s) V^T via eigen of F^T F
static void svd3(const M3& f, M3& u, double s[3], M3& v) {
  M3 ftf = mul(tr(f), f);
  double w[3];
  sym_eig(ftf, w, v);
  // sort descending
  int idx[3] = {0, 1, 2};
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (w[idx[j]] > w[idx[i]]) std::swap(idx[i], idx[j]);
  M3 vs;
  for (int i = 0; i < 3; ++i) {
    s[i] = sqrt(std::max(w[idx[i]], 0.0));
    for (int r = 0; r < 3; ++r) vs.m[r][i] = v.m[r][idx[i]];
  }
  v = vs;
  // u = F v / s
  for (int i = 0; i < 3; ++i) {
    double inv = s[i] > 1e-12 ? 1.0 / s[i] : 0.0;
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += f.m[r][k] * v.m[k][i];
      u.m[r][i] = acc * inv;
    }
  }
}

// dR via the skew system (deformHeader.h:133-147)
static M3 polar_delta(const M3& r, const M3& s, const M3& df) {
  M3 rhs = mul(tr(r), df);
  M3 t2 = mul(tr(df), r);
  for (int i = 0; i < 3; ++i) for (int j = 0; j < 3; ++j) rhs.m[i][j] -= t2.m[i][j];
  double b[3] = {rhs.m[0][1], rhs.m[0][2], rhs.m[1][2]};
  double m[3][3] = {
      {s.m[0][0] + s.m[1][1], s.m[1][2], -s.m[0][2]},
      {s.m[1][2], s.m[0][0] + s.m[2][2], s.m[0][1]},
      {-s.m[0][2], s.m[0][1], s.m[1][1] + s.m[2][2]}};
  // solve 3x3 by Cramer
  M3 mm; memcpy(mm.m, m, sizeof(m));
  double dm = det(mm);
  double x[3] = {0, 0, 0};
  if (fabs(dm) > 1e-18) {
    for (int c = 0; c < 3; ++c) {
      M3 t = mm;
      for (int rr = 0; rr < 3; ++rr) t.m[rr][c] = b[rr];
      x[c] = det(t) / dm;
    }
  }
  M3 k{};
  k.m[0][1] = x[0]; k.m[0][2] = x[1]; k.m[1][2] = x[2];
  k.m[1][0] = -x[0]; k.m[2][0] = -x[1]; k.m[2][1] = -x[2];
  return mul(r, k);
}

// ----- MPM kernel (mpm.cc:25-41 / deformHeader.h:38-105) -----
static double bpiece(double a) {
  if (a < 0.5) return 4*a*a*a - 4*a*a + 2.0/3.0;
  if (a <= 1.0) return -4.0/3.0*a*a*a + 4*a*a - 4*a + 4.0/3.0;
  return 0.0;
}
static double spline_mpm(double x) { return bpiece(fabs(x - 0.5)); }
static double dspline2(double x) {
  double a = fabs(x), m;
  if (a < 0.5) m = 12*a*a - 8*a;
  else if (a <= 1.0) m = -4*a*a + 8*a - 4;
  else m = 0;
  return (x > 0 ? m : (x < 0 ? -m : 0));
}
static void grad_w(const double p[3], const int c[3], double* w, V3* g) {
  double s[3], dg[3];
  for (int d = 0; d < 3; ++d) {
    double t = p[d] - c[d] - 0.5;
    s[d] = bpiece(fabs(t));
    dg[d] = -dspline2(t);
  }
  if (w) *w = s[0]*s[1]*s[2];
  if (g) {
    g->v[0] = dg[0]*s[1]*s[2];
    g->v[1] = s[0]*dg[1]*s[2];
    g->v[2] = s[0]*s[1]*dg[2];
  }
}

struct Sim {
  int B, N, wall;
  double dx = 1, E = 48000, nu = 0.47, beta = 0.5, eps = 10;
  double theta_c = 0.025, theta_s = 0.0075, maxdt = 0.001, g = -10;
  double hardening_max = 10.0, max_gradv_dt = 0.5;
  double mu0, lam0;
  std::vector<float> mass;
  std::vector<double> u, v, w_, fx, fy, fz;
  std::vector<uint8_t> solid, active;
  std::vector<double> px, py, pz, vx, vy, vz, vol;
  std::vector<M3> FE, FP, P0, R_, S_;
  std::vector<double> mu, lam;

  size_t idx(int x, int y, int z) const {
    return ((size_t)(x + B) * N + (y + B)) * N + (z + B);
  }
  bool isSolid(int x, int y, int z) const {
    if (abs(x) > B || abs(y) > B || abs(z) > B) return false;
    return solid[idx(x, y, z)];
  }

  Sim(int bound) : B(bound), N(2 * bound + 1), wall(bound - 2) {
    mu0 = E / (2 * (1 + nu));
    lam0 = E * nu / ((1 + nu) * (1 - 2 * nu));
    size_t n3 = (size_t)N * N * N;
    mass.assign(n3, 0);
    for (auto* a : {&u, &v, &w_, &fx, &fy, &fz}) a->assign(n3, 0);
    solid.assign(n3, 0);
    active.assign(n3, 0);
    for (int x = -B; x <= B; ++x)
      for (int y = -B; y <= B; ++y)
        for (int z = -B; z <= B; ++z)
          if (abs(x) > wall || abs(y) > wall || abs(z) > wall)
            solid[idx(x, y, z)] = 1;
  }

  void load_particles(const char* path) {
    FILE* f = fopen(path, "rb");
    fseek(f, 0, SEEK_END);
    size_t p = ftell(f) / 12;
    fseek(f, 0, SEEK_SET);
    std::vector<float> buf(p * 3);
    if (fread(buf.data(), 4, p * 3, f) != p * 3) exit(1);
    fclose(f);
    px.resize(p); py.resize(p); pz.resize(p);
    for (size_t i = 0; i < p; ++i) {
      px[i] = buf[3*i]; py[i] = buf[3*i+1]; pz[i] = buf[3*i+2];
    }
    vx.assign(p, 0); vy.assign(p, -50); vz.assign(p, 0);
    vol.assign(p, 0);
    FE.assign(p, eye()); FP.assign(p, eye());
  }

  template <typename Fn>
  void stencil(size_t i, Fn&& fn) {
    double p[3] = {px[i], py[i], pz[i]};
    int cx = (int)lround(px[i]), cy = (int)lround(py[i]), cz = (int)lround(pz[i]);
    for (int a = cx - 1; a <= cx + 1; ++a)
      for (int b = cy - 1; b <= cy + 1; ++b)
        for (int c = cz - 1; c <= cz + 1; ++c) {
          if (abs(a) > B || abs(b) > B || abs(c) > B) continue;
          int cc[3] = {a, b, c};
          fn(a, b, c, p, cc);
        }
  }

  void frame(int f, double& dt) {
    size_t n3 = mass.size(), np = px.size();
    std::fill(mass.begin(), mass.end(), 0.f);
    for (auto* a : {&u, &v, &w_, &fx, &fy, &fz}) std::fill(a->begin(), a->end(), 0.0);

    // mass P2G (~solid & w>0) and momentum (~solid & within B-2)
    for (size_t i = 0; i < np; ++i)
      stencil(i, [&](int a, int b, int c, double* p, int* cc) {
        if (isSolid(a, b, c)) return;
        double w;
        grad_w(p, cc, &w, nullptr);
        if (w > 0) mass[idx(a, b, c)] += (float)w;
        if (abs(a) <= B - 2 && abs(b) <= B - 2 && abs(c) <= B - 2) {
          size_t k = idx(a, b, c);
          u[k] += w * vx[i]; v[k] += w * vy[i]; w_[k] += w * vz[i];
        }
      });
    for (size_t k = 0; k < n3; ++k) {
      if (mass[k] > 0.1 && !solid[k]) {
        u[k] /= mass[k]; v[k] /= mass[k]; w_[k] /= mass[k];
        active[k] = 1;
      } else { u[k] = v[k] = w_[k] = 0; active[k] = 0; }
    }
    if (f == 0) {
      for (size_t i = 0; i < np; ++i) {
        double dens = 0;
        stencil(i, [&](int a, int b, int c, double* p, int* cc) {
          if (isSolid(a, b, c)) return;
          double w; grad_w(p, cc, &w, nullptr);
          dens += w * mass[idx(a, b, c)];
        });
        vol[i] = dens > 0 ? 1.0 / dens : 0.0;
      }
    }

    std::vector<double> ub = u, vb = v, wb = w_;

    // per-particle stress state (P0, R, S, hardened moduli)
    P0.resize(np); R_.resize(np); S_.resize(np); mu.resize(np); lam.resize(np);
    for (size_t i = 0; i < np; ++i) {
      double e = eps * (1 - det(FP[i]));
      e = std::max(-hardening_max, std::min(hardening_max, e));
      mu[i] = mu0 * exp(e); lam[i] = lam0 * exp(e);
      M3 uu, vv; double s[3];
      svd3(FE[i], uu, s, vv);
      R_[i] = mul(uu, tr(vv));
      M3 sd{}; sd.m[0][0]=s[0]; sd.m[1][1]=s[1]; sd.m[2][2]=s[2];
      S_[i] = mul(mul(vv, sd), tr(vv));
      double J = det(FE[i]);
      M3 cf = cof(FE[i]);
      for (int r = 0; r < 3; ++r)
        for (int c2 = 0; c2 < 3; ++c2)
          P0[i].m[r][c2] = 2*mu[i]*(FE[i].m[r][c2]-R_[i].m[r][c2])
                         + lam[i]*(J-1)*cf.m[r][c2];
    }

    // explicit forces f = -V (P0 FE^T) gradW
    for (size_t i = 0; i < np; ++i) {
      M3 sig = mul(P0[i], tr(FE[i]));
      stencil(i, [&](int a, int b, int c, double* p, int* cc) {
        if (isSolid(a, b, c)) return;
        V3 gw; grad_w(p, cc, nullptr, &gw);
        size_t k = idx(a, b, c);
        for (int r = 0; r < 3; ++r) {
          double fr = -vol[i]*(sig.m[r][0]*gw.v[0]+sig.m[r][1]*gw.v[1]+sig.m[r][2]*gw.v[2]);
          (r==0?fx:(r==1?fy:fz))[k] += fr;
        }
      });
    }

    // b = v + dt (f/m + g) on active cells
    std::vector<double> bx(n3,0), by(n3,0), bz(n3,0);
    for (size_t k = 0; k < n3; ++k)
      if (active[k]) {
        bx[k] = u[k] + dt*(fx[k]/mass[k]);
        by[k] = v[k] + dt*(fy[k]/mass[k] + g);
        bz[k] = w_[k] + dt*(fz[k]/mass[k]);
      }

    // matvec: out = w + beta dt^2 / m * (-df(w)) on active cells
    auto matvec = [&](const std::vector<double>& inx, const std::vector<double>& iny,
                      const std::vector<double>& inz, std::vector<double>& ox,
                      std::vector<double>& oy, std::vector<double>& oz) {
      static std::vector<double> dfx, dfy, dfz;
      dfx.assign(n3,0); dfy.assign(n3,0); dfz.assign(n3,0);
      for (size_t i = 0; i < np; ++i) {
        // G = sum_active u(cell) gradW^T
        M3 G{};
        stencil(i, [&](int a, int b, int c, double* p, int* cc) {
          size_t k = idx(a, b, c);
          if (!active[k]) return;
          V3 gw; grad_w(p, cc, nullptr, &gw);
          double uv[3] = {inx[k], iny[k], inz[k]};
          for (int r = 0; r < 3; ++r)
            for (int c2 = 0; c2 < 3; ++c2) G.m[r][c2] += uv[r]*gw.v[c2];
        });
        M3 dFE = mul(G, FE[i]);
        M3 dR = polar_delta(R_[i], S_[i], dFE);
        double J = det(FE[i]);
        M3 cf = cof(FE[i]);
        M3 dc = dcof(FE[i], dFE);
        double cdot = ddot(cf, dFE);
        M3 dP;
        for (int r = 0; r < 3; ++r)
          for (int c2 = 0; c2 < 3; ++c2)
            dP.m[r][c2] = 2*mu[i]*(dFE.m[r][c2]-dR.m[r][c2])
                        + lam[i]*(cdot*cf.m[r][c2] + (J-1)*dc.m[r][c2]);
        M3 dsig = mul(dP, tr(FE[i]));
        stencil(i, [&](int a, int b, int c, double* p, int* cc) {
          if (isSolid(a, b, c)) return;
          V3 gw; grad_w(p, cc, nullptr, &gw);
          size_t k = idx(a, b, c);
          for (int r = 0; r < 3; ++r) {
            double fr = -vol[i]*(dsig.m[r][0]*gw.v[0]+dsig.m[r][1]*gw.v[1]+dsig.m[r][2]*gw.v[2]);
            (r==0?dfx:(r==1?dfy:dfz))[k] += fr;
          }
        });
      }
      double bdt2 = beta*dt*dt;
      for (size_t k = 0; k < n3; ++k) {
        if (active[k]) {
          ox[k] = inx[k] + bdt2*(-dfx[k])/mass[k];
          oy[k] = iny[k] + bdt2*(-dfy[k])/mass[k];
          oz[k] = inz[k] + bdt2*(-dfz[k])/mass[k];
        } else { ox[k] = inx[k]; oy[k] = iny[k]; oz[k] = inz[k]; }
      }
    };

    // unpreconditioned CG
    std::vector<double> X(n3,0), Y(n3,0), Z(n3,0), rx=bx, ry=by, rz=bz,
        dxv=rx, dyv=ry, dzv=rz, qx(n3), qy(n3), qz(n3);
    double bn2 = 0; for (size_t k=0;k<n3;++k) bn2 += bx[k]*bx[k]+by[k]*by[k]+bz[k]*bz[k];
    double rz0 = bn2;
    for (int it = 0; it < 1000 && rz0 > 1e-12*bn2 && bn2 > 0; ++it) {
      matvec(dxv, dyv, dzv, qx, qy, qz);
      double dq = 0; for (size_t k=0;k<n3;++k) dq += dxv[k]*qx[k]+dyv[k]*qy[k]+dzv[k]*qz[k];
      if (dq == 0) break;
      double alpha = rz0/dq;
      for (size_t k=0;k<n3;++k) {
        X[k]+=alpha*dxv[k]; Y[k]+=alpha*dyv[k]; Z[k]+=alpha*dzv[k];
        rx[k]-=alpha*qx[k]; ry[k]-=alpha*qy[k]; rz[k]-=alpha*qz[k];
      }
      double rz1 = 0; for (size_t k=0;k<n3;++k) rz1 += rx[k]*rx[k]+ry[k]*ry[k]+rz[k]*rz[k];
      double betacg = rz1/rz0;
      for (size_t k=0;k<n3;++k) {
        dxv[k]=rx[k]+betacg*dxv[k]; dyv[k]=ry[k]+betacg*dyv[k]; dzv[k]=rz[k]+betacg*dzv[k];
      }
      rz0 = rz1;
    }
    for (size_t k = 0; k < n3; ++k) {
      if (active[k]) { u[k]=X[k]; v[k]=Y[k]; w_[k]=Z[k]; }
      else { u[k]=v[k]=w_[k]=0; }
    }

    // deformation gradient update with limiter + SVD clamp
    for (size_t i = 0; i < np; ++i) {
      M3 G{};
      stencil(i, [&](int a, int b, int c, double* p, int* cc) {
        if (isSolid(a, b, c)) return;
        V3 gw; grad_w(p, cc, nullptr, &gw);
        size_t k = idx(a, b, c);
        double uv[3] = {u[k], v[k], w_[k]};
        for (int r = 0; r < 3; ++r)
          for (int c2 = 0; c2 < 3; ++c2) G.m[r][c2] += uv[r]*gw.v[c2];
      });
      double gmax = 0;
      for (int r=0;r<3;++r) for (int c2=0;c2<3;++c2) gmax = std::max(gmax, fabs(G.m[r][c2]));
      double sc = std::min(1.0, max_gradv_dt / std::max(dt*gmax, 1e-12));
      M3 tfe = FE[i];
      for (int r=0;r<3;++r)
        for (int c2=0;c2<3;++c2) {
          double acc = 0;
          for (int k2=0;k2<3;++k2) acc += (((r==k2)?1.0:0.0) + dt*sc*G.m[r][k2]) * FE[i].m[k2][c2];
          tfe.m[r][c2] = acc;
        }
      M3 ftot = mul(tfe, FP[i]);
      M3 uu, vv; double s[3];
      svd3(tfe, uu, s, vv);
      for (int k2=0;k2<3;++k2) s[k2] = std::max(1-theta_c, std::min(1+theta_s, s[k2]));
      M3 sd{}; sd.m[0][0]=s[0]; sd.m[1][1]=s[1]; sd.m[2][2]=s[2];
      FE[i] = mul(mul(uu, sd), tr(vv));
      M3 sinv{}; sinv.m[0][0]=1/s[0]; sinv.m[1][1]=1/s[1]; sinv.m[2][2]=1/s[2];
      FP[i] = mul(mul(mul(vv, sinv), tr(uu)), ftot);
    }

    // FLIP gather (cell-centred averages, within-wall mask) + CFL + advect
    auto center = [&](const std::vector<double>& uu, const std::vector<double>& vv,
                      const std::vector<double>& ww, int a, int b, int c, double out[3]) {
      size_t k = idx(a, b, c);
      double up = a+1 <= B ? uu[idx(a+1,b,c)] : 0.0;
      double vp = b+1 <= B ? vv[idx(a,b+1,c)] : 0.0;
      double wp = c+1 <= B ? ww[idx(a,b,c+1)] : 0.0;
      out[0] = 0.5*(uu[k]+up); out[1] = 0.5*(vv[k]+vp); out[2] = 0.5*(ww[k]+wp);
    };
    double maxspeed = 0;
    for (size_t i = 0; i < np; ++i) {
      double weight = 0, del[3] = {0,0,0};
      stencil(i, [&](int a, int b, int c, double* p, int* cc) {
        if (abs(a) > wall || abs(b) > wall || abs(c) > wall) return;
        double cn[3], co[3];
        center(u, v, w_, a, b, c, cn);
        center(ub, vb, wb, a, b, c, co);
        double w2 = spline_mpm(p[0]-a)*spline_mpm(p[1]-b)*spline_mpm(p[2]-c);
        weight += w2;
        for (int d2 = 0; d2 < 3; ++d2) del[d2] += (cn[d2]-co[d2])*w2;
      });
      if (weight != 0) for (int d2 = 0; d2 < 3; ++d2) del[d2] /= weight;
      vx[i]+=del[0]; vy[i]+=del[1]; vz[i]+=del[2];
      double sp = sqrt(vx[i]*vx[i]+vy[i]*vy[i]+vz[i]*vz[i]);
      maxspeed = std::max(maxspeed, sp);
    }
    dt = maxspeed != 0 ? std::min(maxdt, dx/maxspeed) : maxdt;
    auto rnd_out = [](double x){ return x > 0 ? (int)ceil(x) : (int)floor(x); };
    for (size_t i = 0; i < np; ++i) {
      double nx2 = px[i]+dt*vx[i], ny2 = py[i]+dt*vy[i], nz2 = pz[i]+dt*vz[i];
      int rx2 = rnd_out(nx2), ry2 = rnd_out(ny2), rz2 = rnd_out(nz2);
      if (isSolid(rx2, ry2, rz2)) {
        if (isSolid(rx2, (int)py[i], (int)pz[i])) vx[i] = 0;
        if (isSolid((int)px[i], ry2, (int)pz[i])) vy[i] = 0;
        if (isSolid((int)px[i], (int)py[i], rz2)) vz[i] = 0;
        px[i]+=dt*vx[i]; py[i]+=dt*vy[i]; pz[i]+=dt*vz[i];
      } else { px[i]=nx2; py[i]=ny2; pz[i]=nz2; }
    }
  }
};

int main(int argc, char** argv) {
  int bound = argc > 1 ? atoi(argv[1]) : 15;
  int frames = argc > 3 ? atoi(argv[3]) : 10;
  const char* pf = argc > 4 ? argv[4] : nullptr;
  if (!pf) { fprintf(stderr, "particle file required\n"); return 1; }
  Sim sim(bound);
  sim.load_particles(pf);
  fprintf(stderr, "# ref_mpm: grid %d^3, %zu particles\n", sim.N, sim.px.size());
  double dt = sim.maxdt;
  for (int f = 0; f < frames; ++f) {
    sim.frame(f, dt);
    double ke = 0;
    for (size_t i = 0; i < sim.px.size(); ++i)
      ke += 0.5*(sim.vx[i]*sim.vx[i]+sim.vy[i]*sim.vy[i]+sim.vz[i]*sim.vz[i]);
    printf("{\"frame\": %d, \"ke\": %.8e, \"dt\": %.8f}\n", f, ke, dt);
  }
  return 0;
}
