// Native trajectory-analysis runtime for mpmc_tpu: radial distribution
// functions and sorbate COM density grids over multi-frame PQR
// trajectories.
//
// The reference ships its analysis inside the C runtime (SURVEY.md §2
// "Histogram"/"OpenDX writer" — src/main/histogram.c accumulates sorbate
// population grids during the run); post-hoc trajectory analysis of the
// same observables is the natural native companion.  A 10k-atom,
// thousand-frame trajectory is ~10^7 ATOM lines and ~10^10 pair
// distances — line parsing lives in mpmc_io.cpp (same .so), and the
// O(frames * Na * Nb) pair loops below run at memory bandwidth in C++
// where numpy needs per-frame temporaries.  Python fallbacks in
// mpmc_tpu/analyze.py are the reference implementation and are
// cross-validated in tests/test_analyze.py.
//
// Exposed as a plain C ABI via ctypes (mpmc_tpu/io/native.py).  The
// trajectory handle is the File* returned by pqr_open (mpmc_io.cpp);
// both TUs compile into libmpmc_io.so and share the in-memory model
// via mpmc_common.h.

#include <array>
#include <cctype>
#include <cmath>
#include <cstring>
#include <map>
#include <random>
#include <string>
#include <vector>

#include "mpmc_common.h"

using mpmc_native::Atom;
using mpmc_native::File;
using mpmc_native::Frame;

namespace {

struct Cell {
    double b[3][3];     // row-vector basis
    double inv[3][3];
    double volume;
};

// Row basis from (a,b,c,alpha,beta,gamma[deg]) — the CRYST1 convention,
// identical to ops/pbc.py::cell_from_abc (a along x, b in xy).
bool cell_from_abc(const double* abc, Cell* c) {
    const double deg = M_PI / 180.0;
    double a = abc[0], b = abc[1], cc = abc[2];
    double al = abc[3] * deg, be = abc[4] * deg, ga = abc[5] * deg;
    if (a <= 0 || b <= 0 || cc <= 0) return false;
    double bx = b * std::cos(ga), by = b * std::sin(ga);
    double cx = cc * std::cos(be);
    double cy = cc * (std::cos(al) - std::cos(be) * std::cos(ga))
                / std::sin(ga);
    double cz2 = cc * cc - cx * cx - cy * cy;
    if (cz2 <= 0) return false;
    double m[3][3] = {{a, 0, 0}, {bx, by, 0}, {cx, cy, std::sqrt(cz2)}};
    std::memcpy(c->b, m, sizeof m);
    // inverse of a lower-triangular row basis
    double det = m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
               - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
               + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
    if (det == 0) return false;
    c->volume = std::fabs(det);
    double inv[3][3] = {
        {(m[1][1] * m[2][2] - m[1][2] * m[2][1]) / det,
         (m[0][2] * m[2][1] - m[0][1] * m[2][2]) / det,
         (m[0][1] * m[1][2] - m[0][2] * m[1][1]) / det},
        {(m[1][2] * m[2][0] - m[1][0] * m[2][2]) / det,
         (m[0][0] * m[2][2] - m[0][2] * m[2][0]) / det,
         (m[0][2] * m[1][0] - m[0][0] * m[1][2]) / det},
        {(m[1][0] * m[2][1] - m[1][1] * m[2][0]) / det,
         (m[0][1] * m[2][0] - m[0][0] * m[2][1]) / det,
         (m[0][0] * m[1][1] - m[0][1] * m[1][0]) / det}};
    std::memcpy(c->inv, inv, sizeof inv);
    return true;
}

bool frame_cell(const Frame& fr, const double* fallback, Cell* c) {
    if (fr.has_box && cell_from_abc(fr.box, c)) return true;
    return fallback && cell_from_abc(fallback, c);
}

// minimum-image displacement (valid for r < half min perpendicular width)
inline void min_image(const Cell& c, double dx, double dy, double dz,
                      double* out) {
    double f[3];
    for (int k = 0; k < 3; ++k) {
        f[k] = dx * c.inv[0][k] + dy * c.inv[1][k] + dz * c.inv[2][k];
        f[k] -= std::nearbyint(f[k]);
    }
    for (int k = 0; k < 3; ++k)
        out[k] = f[0] * c.b[0][k] + f[1] * c.b[1][k] + f[2] * c.b[2][k];
}

// case-insensitive: PQR names are uppercased on output while users
// type species as given in their input decks ("Ar" vs "AR")
inline bool name_match(const char* name, const char* pat) {
    if (pat[0] == '*') return true;
    for (;; ++name, ++pat) {
        int a = std::toupper(static_cast<unsigned char>(*name));
        int b = std::toupper(static_cast<unsigned char>(*pat));
        if (a != b) return false;
        if (!a) return true;
    }
}

// flag selector: 0/'*' = all, 'M' = movable only, 'F' = frozen only
inline bool flag_match(char flag, char sel) {
    if (sel == 0 || sel == '*') return true;
    return (flag == 'F') == (sel == 'F');
}

// Half the minimum perpendicular cell width — the largest radius at
// which a minimum-image distance is unambiguous (matches
// ops/pbc.py::half_min_width, the default-cutoff rule).
double half_min_width(const Cell& c) {
    double wmin = 0.0;
    for (int k = 0; k < 3; ++k) {
        const double* u = c.b[(k + 1) % 3];
        const double* v = c.b[(k + 2) % 3];
        double cx = u[1] * v[2] - u[2] * v[1];
        double cy = u[2] * v[0] - u[0] * v[2];
        double cz = u[0] * v[1] - u[1] * v[0];
        double area = std::sqrt(cx * cx + cy * cy + cz * cz);
        if (area <= 0.0) return 0.0;
        double w = c.volume / area;
        if (k == 0 || w < wmin) wmin = w;
    }
    return 0.5 * wmin;
}

// First frame of a handle (geometry analyzers characterize the input
// structure, not the trajectory).  Returns nullptr on parse error /
// empty file.
const Frame* first_frame(File* file) {
    mpmc_native::rewind_frames(file);
    return mpmc_native::next_frame(file);
}

}  // namespace

extern "C" {

// g(r) between atom-name selections over every frame of an open
// trajectory handle.  Ordered pairs (i in A, j in B, i != j) are binned
// by minimum-image distance; normalization uses the per-frame ideal-gas
// pair density (sum of Na*Nb - |A∩B| over V), so GCMC trajectories with
// varying N and NPT trajectories with varying V normalize correctly.
// Returns frames processed; -1 if any frame lacks a usable cell, -2 on
// bad arguments.  gr_out: [nbins] g(r) at bin centers r = (k+0.5)*dr.
long traj_rdf(void* h, const char* name_a, const char* name_b,
              char flag_a, char flag_b, const double* fallback_cell,
              double rmax, long nbins, double* gr_out) {
    auto* file = static_cast<File*>(h);
    if (!file || nbins <= 0 || rmax <= 0) return -2;
    const double dr = rmax / static_cast<double>(nbins);
    std::vector<double> hist(nbins, 0.0);
    double norm = 0.0;   // sum over frames of (ordered pair count) / V
    long n_frames = 0;
    std::vector<const Atom*> sa, sb;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        sa.clear();
        sb.clear();
        for (const Atom& a : fr.atoms) {
            if (name_match(a.name, name_a) && flag_match(a.flag, flag_a))
                sa.push_back(&a);
            if (name_match(a.name, name_b) && flag_match(a.flag, flag_b))
                sb.push_back(&a);
        }
        long overlap = 0;
        for (const Atom* a : sa)
            if (name_match(a->name, name_b) && flag_match(a->flag, flag_b))
                ++overlap;
        const double r2max = rmax * rmax;
        const long na = static_cast<long>(sa.size());
        // per-thread histograms, merged after: counts are integral so
        // the result is exactly the serial one in any thread order
#pragma omp parallel if (na * static_cast<long>(sb.size()) > 100000)
        {
            std::vector<double> local(nbins, 0.0);
#pragma omp for nowait
            for (long ia = 0; ia < na; ++ia) {
                const Atom* a = sa[ia];
                for (const Atom* b : sb) {
                    if (a == b) continue;
                    double d[3];
                    min_image(cell, a->x - b->x, a->y - b->y,
                              a->z - b->z, d);
                    double r2 = d[0] * d[0] + d[1] * d[1]
                              + d[2] * d[2];
                    if (r2 < r2max) {
                        long k = static_cast<long>(std::sqrt(r2) / dr);
                        if (k >= nbins) k = nbins - 1;
                        local[k] += 1.0;
                    }
                }
            }
#pragma omp critical
            for (long k = 0; k < nbins; ++k) hist[k] += local[k];
        }
        double npairs = static_cast<double>(sa.size()) * sb.size()
                      - static_cast<double>(overlap);
        norm += npairs / cell.volume;
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    const double four_thirds_pi = 4.0 * M_PI / 3.0;
    for (long k = 0; k < nbins; ++k) {
        double r0 = k * dr, r1 = (k + 1) * dr;
        double vshell = four_thirds_pi * (r1 * r1 * r1 - r0 * r0 * r0);
        gr_out[k] = norm > 0.0 ? hist[k] / (norm * vshell) : 0.0;
    }
    return n_frames;
}

// Accumulate molecule-COM counts into an [nx,ny,nz] fractional grid
// (C order, x slowest — the PopulationHistogram layout).  Molecules are
// grouped by mol_id within each frame and selected by mol_name pattern +
// flag; the COM is mass-weighted with the molecule unwrapped via
// minimum image about its first atom (centroid when the mass sum is 0).
// Returns frames processed; -1 if any frame lacks a usable cell, -2 on
// bad arguments.  grid must be zero-initialized by the caller.
long traj_density(void* h, const char* mol_name, char flag_sel,
                  long nx, long ny, long nz, const double* fallback_cell,
                  double* grid) {
    auto* file = static_cast<File*>(h);
    if (!file || nx <= 0 || ny <= 0 || nz <= 0) return -2;
    long n_frames = 0;
    std::map<long, std::vector<const Atom*>> mols;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        mols.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.mol_name, mol_name)
                && flag_match(a.flag, flag_sel))
                mols[a.mol_id].push_back(&a);
        for (const auto& kv : mols) {
            const auto& atoms = kv.second;
            const Atom* a0 = atoms[0];
            double msum = 0.0, com[3] = {0, 0, 0};
            for (const Atom* a : atoms) {
                double d[3];
                min_image(cell, a->x - a0->x, a->y - a0->y, a->z - a0->z,
                          d);
                double w = a->mass;
                msum += w;
                for (int k = 0; k < 3; ++k) com[k] += w * d[k];
            }
            if (msum <= 0.0) {   // massless selection: plain centroid
                msum = static_cast<double>(atoms.size());
                com[0] = com[1] = com[2] = 0.0;
                for (const Atom* a : atoms) {
                    double d[3];
                    min_image(cell, a->x - a0->x, a->y - a0->y,
                              a->z - a0->z, d);
                    for (int k = 0; k < 3; ++k) com[k] += d[k];
                }
            }
            double p[3] = {a0->x + com[0] / msum, a0->y + com[1] / msum,
                           a0->z + com[2] / msum};
            double f[3];
            for (int k = 0; k < 3; ++k) {
                f[k] = p[0] * cell.inv[0][k] + p[1] * cell.inv[1][k]
                     + p[2] * cell.inv[2][k];
                f[k] -= std::floor(f[k]);
            }
            long dims[3] = {nx, ny, nz};
            long idx[3];
            for (int k = 0; k < 3; ++k) {
                idx[k] = static_cast<long>(f[k] * dims[k]);
                if (idx[k] >= dims[k]) idx[k] = dims[k] - 1;
                if (idx[k] < 0) idx[k] = 0;
            }
            grid[(idx[0] * ny + idx[1]) * nz + idx[2]] += 1.0;
        }
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    return n_frames;
}

// Mass-weighted COM of one molecule's atoms, min-image unwrapped about
// the first atom (centroid when massless) — the traj_density rule,
// shared with traj_msd.
static void mol_com(const Cell& cell, const std::vector<const Atom*>& atoms,
                    double out[3]) {
    const Atom* a0 = atoms[0];
    double msum = 0.0, com[3] = {0, 0, 0};
    for (const Atom* a : atoms) {
        double d[3];
        min_image(cell, a->x - a0->x, a->y - a0->y, a->z - a0->z, d);
        double w = a->mass;
        msum += w;
        for (int k = 0; k < 3; ++k) com[k] += w * d[k];
    }
    if (msum <= 0.0) {
        msum = static_cast<double>(atoms.size());
        com[0] = com[1] = com[2] = 0.0;
        for (const Atom* a : atoms) {
            double d[3];
            min_image(cell, a->x - a0->x, a->y - a0->y, a->z - a0->z, d);
            for (int k = 0; k < 3; ++k) com[k] += d[k];
        }
    }
    out[0] = a0->x + com[0] / msum;
    out[1] = a0->y + com[1] / msum;
    out[2] = a0->z + com[2] / msum;
}

// Per-frame selected-molecule counts (GCMC loading time series).
// counts_out must hold pqr_n_frames(h) doubles.  Returns frames
// processed; -2 on bad arguments.
long traj_loading(void* h, const char* mol_name, char flag_sel,
                  double* counts_out) {
    auto* file = static_cast<File*>(h);
    // counts_out is sized via pqr_n_frames, unknown for a stream
    if (!file || !counts_out || file->fp) return -2;
    long n_frames = 0;
    std::map<long, bool> seen;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        seen.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.mol_name, mol_name)
                && flag_match(a.flag, flag_sel))
                seen[a.mol_id] = true;
        counts_out[n_frames++] = static_cast<double>(seen.size());
    }
    if (!file->error.empty()) return -3;
    return n_frames;
}

// Mean-square COM displacement vs frame lag.  Each molecule's COM is
// unwrapped across frames by accumulating minimum-image increments
// (valid while no molecule hops more than half a cell between frames);
// a molecule absent from a frame closes its trajectory segment, and a
// reappearance (GCMC re-insertion into the same slot id) starts a new
// one, so exchange trajectories never alias.  All time origins within
// each segment contribute: msd_out[t] = <|u(s+t) - u(s)|^2>,
// cnt_out[t] = number of (segment, origin) samples at lag t (0 where
// no segment is long enough).  Returns frames processed; -1 if any
// frame lacks a usable cell, -2 on bad arguments.
long traj_msd(void* h, const char* mol_name, char flag_sel,
              const double* fallback_cell, long max_lag,
              double* msd_out, long* cnt_out) {
    auto* file = static_cast<File*>(h);
    if (!file || max_lag <= 0 || !msd_out || !cnt_out) return -2;
    using Vec3 = std::array<double, 3>;
    std::vector<std::vector<Vec3>> segments;   // closed
    struct Open { std::vector<Vec3> u; Vec3 last_wrapped; };
    std::map<long, Open> open;
    std::map<long, std::vector<const Atom*>> mols;
    long n_frames = 0;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        mols.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.mol_name, mol_name)
                && flag_match(a.flag, flag_sel))
                mols[a.mol_id].push_back(&a);
        // close segments for molecules that vanished this frame
        for (auto it = open.begin(); it != open.end();) {
            if (mols.find(it->first) == mols.end()) {
                segments.push_back(std::move(it->second.u));
                it = open.erase(it);
            } else {
                ++it;
            }
        }
        for (const auto& kv : mols) {
            double c[3];
            mol_com(cell, kv.second, c);
            auto it = open.find(kv.first);
            if (it == open.end()) {
                Open o;
                o.u = {{c[0], c[1], c[2]}};
                o.last_wrapped = {c[0], c[1], c[2]};
                open.emplace(kv.first, std::move(o));
            } else {
                Open& o = it->second;
                double d[3];
                min_image(cell, c[0] - o.last_wrapped[0],
                          c[1] - o.last_wrapped[1],
                          c[2] - o.last_wrapped[2], d);
                const Vec3& prev = o.u.back();
                o.u.push_back({prev[0] + d[0], prev[1] + d[1],
                               prev[2] + d[2]});
                o.last_wrapped = {c[0], c[1], c[2]};
            }
        }
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    for (auto& kv : open) segments.push_back(std::move(kv.second.u));
    for (long t = 0; t <= max_lag; ++t) {
        msd_out[t] = 0.0;
        cnt_out[t] = 0;
    }
    const long nseg = static_cast<long>(segments.size());
#pragma omp parallel if (nseg > 8)
    {
        std::vector<double> lmsd(max_lag + 1, 0.0);
        std::vector<long> lcnt(max_lag + 1, 0);
#pragma omp for schedule(dynamic, 1) nowait
        for (long g = 0; g < nseg; ++g) {
            const auto& seg = segments[g];
            const long L = static_cast<long>(seg.size());
            for (long t = 1; t <= max_lag && t < L; ++t) {
                for (long s = 0; s + t < L; ++s) {
                    double dx = seg[s + t][0] - seg[s][0];
                    double dy = seg[s + t][1] - seg[s][1];
                    double dz = seg[s + t][2] - seg[s][2];
                    lmsd[t] += dx * dx + dy * dy + dz * dz;
                    ++lcnt[t];
                }
            }
        }
#pragma omp critical
        for (long t = 0; t <= max_lag; ++t) {
            msd_out[t] += lmsd[t];
            cnt_out[t] += lcnt[t];
        }
    }
    for (long t = 1; t <= max_lag; ++t)
        if (cnt_out[t] > 0) msd_out[t] /= static_cast<double>(cnt_out[t]);
    return n_frames;
}

// Widom test-particle insertion over every frame (beyond-reference
// extension — the framework's run-time Henry behavior is validated by
// tests/test_henry.py; this is the post-hoc trajectory analogue).  A
// single-site LJ ghost (eps_t [K], sig_t [A], Lorentz-Berthelot mixed
// against each frame atom's eps/sig columns) is inserted at n_try
// positions per frame; U is the minimum-image LJ energy within rc.
//
//   out[0] = <exp(-beta U)>        (per-frame mean, frames averaged
//                                   evenly — canonical-frame Widom)
//   out[1] = <U exp(-beta U)>      (same averaging; the caller forms
//                                   the infinite-dilution adsorption
//                                   energy <U>_0 = out[1]/out[0] and
//                                   mu_ex = -ln(out[0])/beta)
//
// frac_pos: optional [n_try*3] fractional insertion coordinates reused
// for every frame (the cross-validation tests feed the same points to
// the numpy reference); NULL draws n_try fresh uniform points per frame
// from a splitmix-seeded mt19937_64.  Returns frames processed; -1 if
// any frame lacks a usable cell, -2 on bad arguments.
long traj_widom(void* h, double eps_t, double sig_t, double beta,
                long n_try, unsigned long long seed,
                const double* frac_pos, const double* fallback_cell,
                double rc, double* out) {
    auto* file = static_cast<File*>(h);
    if (!file || n_try <= 0 || !out || rc <= 0 || beta <= 0) return -2;
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    const double rc2 = rc * rc;
    double sum_e = 0.0, sum_ue = 0.0;
    long n_frames = 0;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        double fe = 0.0, fue = 0.0;
        // pre-draw the random points serially (identical stream to the
        // serial code), then run the trials in parallel
        std::vector<double> drawn;
        if (!frac_pos) {
            drawn.resize(3 * n_try);
            for (double& v : drawn) v = uni(rng);
        }
        const double* pts = frac_pos ? frac_pos : drawn.data();
#pragma omp parallel for reduction(+:fe, fue) schedule(dynamic, 8) \
    if (n_try * static_cast<long>(fr.atoms.size()) > 100000)
        for (long t = 0; t < n_try; ++t) {
            double f[3];
            f[0] = pts[3 * t];
            f[1] = pts[3 * t + 1];
            f[2] = pts[3 * t + 2];
            double p[3];
            for (int k = 0; k < 3; ++k)
                p[k] = f[0] * cell.b[0][k] + f[1] * cell.b[1][k]
                     + f[2] * cell.b[2][k];
            double u = 0.0;
            for (const Atom& a : fr.atoms) {
                if (a.eps <= 0.0) continue;
                double d[3];
                min_image(cell, p[0] - a.x, p[1] - a.y, p[2] - a.z, d);
                double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
                if (r2 >= rc2) continue;
                double sig = 0.5 * (sig_t + a.sig);
                double s2 = sig * sig / (r2 > 1e-12 ? r2 : 1e-12);
                double s6 = s2 * s2 * s2;
                u += 4.0 * std::sqrt(eps_t * a.eps) * s6 * (s6 - 1.0);
            }
            double e = std::exp(-beta * u);
            fe += e;
            fue += u * e;
        }
        sum_e += fe / static_cast<double>(n_try);
        sum_ue += fue / static_cast<double>(n_try);
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    out[0] = n_frames > 0 ? sum_e / static_cast<double>(n_frames) : 0.0;
    out[1] = n_frames > 0 ? sum_ue / static_cast<double>(n_frames) : 0.0;
    return n_frames;
}

// Rigid multi-site Widom insertion with partial charges: the
// generalization of traj_widom to a real insertion template (the GCMC
// insert_input molecule).  Each trial places the template's COM at a
// fractional cell point and applies a uniform random rotation; the
// energy sums, per site x frame atom within rc (minimum image):
//   LJ (Lorentz-Berthelot mixed) when both eps > 0, and
//   cutoff Coulomb ke * q_s * q_a / r when both charges are nonzero.
// Plain-cutoff Coulomb is the documented approximation here — the
// run-time Henry machinery (tests/test_henry.py) is the full-Ewald
// path; for neutral templates (H2/CO2 quadrupoles) the truncation
// error decays as r^-3 shell-averaged.
//
// site_xyz [n_sites*3] are template coordinates about the insertion
// origin (the caller centers them on the COM); try_posquat [n_try*7]
// optionally fixes (frac x,y,z, quat w,x,y,z) per trial, reused every
// frame (the cross-validation path); NULL draws fresh uniform
// positions and Shoemake-uniform rotations per frame from the seed.
// out[0] = <exp(-beta U)>, out[1] = <U exp(-beta U)> (frames averaged
// evenly).  Returns frames processed; -1 if any frame lacks a usable
// cell, -2 on bad arguments.
long traj_widom_mol(void* h, long n_sites, const double* site_xyz,
                    const double* site_eps, const double* site_sig,
                    const double* site_q, double ke, double beta,
                    long n_try, unsigned long long seed,
                    const double* try_posquat,
                    const double* fallback_cell, double rc,
                    double* out) {
    auto* file = static_cast<File*>(h);
    if (!file || n_sites <= 0 || !site_xyz || !site_eps || !site_sig
        || !site_q || n_try <= 0 || !out || rc <= 0 || beta <= 0)
        return -2;
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    const double rc2 = rc * rc;
    const double two_pi = 2.0 * M_PI;
    double sum_e = 0.0, sum_ue = 0.0;
    long n_frames = 0;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        double fe = 0.0, fue = 0.0;
        // pre-draw (serially, identical stream to the serial code) so
        // the trial loop can run in parallel; 6 uniforms per trial
        std::vector<double> drawn;
        if (!try_posquat) {
            drawn.resize(6 * n_try);
            for (double& v : drawn) v = uni(rng);
        }
#pragma omp parallel reduction(+:fe, fue) \
    if (n_try * static_cast<long>(fr.atoms.size()) * n_sites > 100000)
      {
        std::vector<double> rot(3 * n_sites);
#pragma omp for schedule(dynamic, 8) nowait
        for (long t = 0; t < n_try; ++t) {
            double f[3], q[4];
            if (try_posquat) {
                const double* row = try_posquat + 7 * t;
                f[0] = row[0]; f[1] = row[1]; f[2] = row[2];
                double n = std::sqrt(row[3] * row[3] + row[4] * row[4]
                                     + row[5] * row[5] + row[6] * row[6]);
                q[0] = row[3] / n; q[1] = row[4] / n;
                q[2] = row[5] / n; q[3] = row[6] / n;
            } else {
                const double* u = drawn.data() + 6 * t;
                f[0] = u[0]; f[1] = u[1]; f[2] = u[2];
                // Shoemake uniform rotation
                double u1 = u[3], u2 = u[4], u3 = u[5];
                double s1 = std::sqrt(1.0 - u1), s2 = std::sqrt(u1);
                q[0] = s2 * std::cos(two_pi * u3);
                q[1] = s1 * std::sin(two_pi * u2);
                q[2] = s1 * std::cos(two_pi * u2);
                q[3] = s2 * std::sin(two_pi * u3);
            }
            double p[3];
            for (int k = 0; k < 3; ++k)
                p[k] = f[0] * cell.b[0][k] + f[1] * cell.b[1][k]
                     + f[2] * cell.b[2][k];
            // rotate each template site: v' = v + w*t + qv x t,
            // t = 2 qv x v  (unit quaternion (w, qv))
            for (long s = 0; s < n_sites; ++s) {
                const double* v = site_xyz + 3 * s;
                double tx = 2.0 * (q[2] * v[2] - q[3] * v[1]);
                double ty = 2.0 * (q[3] * v[0] - q[1] * v[2]);
                double tz = 2.0 * (q[1] * v[1] - q[2] * v[0]);
                rot[3 * s] = v[0] + q[0] * tx + q[2] * tz - q[3] * ty;
                rot[3 * s + 1] = v[1] + q[0] * ty + q[3] * tx
                               - q[1] * tz;
                rot[3 * s + 2] = v[2] + q[0] * tz + q[1] * ty
                               - q[2] * tx;
            }
            double u = 0.0;
            for (const Atom& a : fr.atoms) {
                const bool a_lj = a.eps > 0.0;
                const bool a_es = a.charge != 0.0;
                if (!a_lj && !a_es) continue;
                for (long s = 0; s < n_sites; ++s) {
                    double d[3];
                    min_image(cell, p[0] + rot[3 * s] - a.x,
                              p[1] + rot[3 * s + 1] - a.y,
                              p[2] + rot[3 * s + 2] - a.z, d);
                    double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
                    if (r2 >= rc2) continue;
                    if (r2 < 1e-12) r2 = 1e-12;
                    if (a_lj && site_eps[s] > 0.0) {
                        double sig = 0.5 * (site_sig[s] + a.sig);
                        double s2 = sig * sig / r2;
                        double s6 = s2 * s2 * s2;
                        u += 4.0 * std::sqrt(site_eps[s] * a.eps) * s6
                             * (s6 - 1.0);
                    }
                    if (a_es && site_q[s] != 0.0)
                        u += ke * site_q[s] * a.charge / std::sqrt(r2);
                }
            }
            double e = std::exp(-beta * u);
            fe += e;
            fue += u * e;
        }
      }
        sum_e += fe / static_cast<double>(n_try);
        sum_ue += fue / static_cast<double>(n_try);
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    out[0] = n_frames > 0 ? sum_e / static_cast<double>(n_frames) : 0.0;
    out[1] = n_frames > 0 ? sum_ue / static_cast<double>(n_frames) : 0.0;
    return n_frames;
}

// Orientational autocorrelation of molecular axes vs frame lag
// (beyond-reference extension; the in-run analogue is the spinflip /
// quantum-rotation machinery — this is the trajectory-side observable
// users compare against NMR/Raman correlation times).  For every
// selected molecule (mol_name pattern + flag), the axis is the
// normalized minimum-image vector between the FIRST TWO atoms whose
// atom name matches axis_name ('*' = the molecule's first two atoms);
// molecules with fewer than two matching atoms are skipped.  Segment
// bookkeeping is identical to traj_msd: a molecule absent from a frame
// closes its segment, so GCMC slot reuse never aliases.  All time
// origins contribute:
//   c1_out[t] = < u(s) . u(s+t) >            (first Legendre, P1)
//   c2_out[t] = < (3 (u(s).u(s+t))^2 - 1)/2 > (second Legendre, P2)
//   cnt_out[t] = samples at lag t
// Returns frames processed; -1 if any frame lacks a usable cell, -2 on
// bad arguments.
long traj_orient(void* h, const char* mol_name, char flag_sel,
                 const char* axis_name, const double* fallback_cell,
                 long max_lag, double* c1_out, double* c2_out,
                 long* cnt_out) {
    auto* file = static_cast<File*>(h);
    if (!file || max_lag <= 0 || !c1_out || !c2_out || !cnt_out)
        return -2;
    using Vec3 = std::array<double, 3>;
    std::vector<std::vector<Vec3>> segments;   // closed axis series
    std::map<long, std::vector<Vec3>> open;
    std::map<long, std::vector<const Atom*>> mols;
    long n_frames = 0;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        mols.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.mol_name, mol_name)
                && flag_match(a.flag, flag_sel))
                mols[a.mol_id].push_back(&a);
        // axis per molecule this frame (molecules lacking two matching
        // atoms this frame behave like absent ones: segment closes)
        std::map<long, Vec3> axes;
        for (const auto& kv : mols) {
            const Atom* a = nullptr;
            const Atom* b = nullptr;
            for (const Atom* at : kv.second) {
                if (!name_match(at->name, axis_name)) continue;
                if (!a) { a = at; continue; }
                b = at;
                break;
            }
            if (!b) continue;
            double d[3];
            min_image(cell, b->x - a->x, b->y - a->y, b->z - a->z, d);
            double n = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
            if (n <= 0.0) continue;
            axes[kv.first] = {d[0] / n, d[1] / n, d[2] / n};
        }
        for (auto it = open.begin(); it != open.end();) {
            if (axes.find(it->first) == axes.end()) {
                segments.push_back(std::move(it->second));
                it = open.erase(it);
            } else {
                ++it;
            }
        }
        for (const auto& kv : axes) open[kv.first].push_back(kv.second);
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    for (auto& kv : open) segments.push_back(std::move(kv.second));
    for (long t = 0; t <= max_lag; ++t) {
        c1_out[t] = c2_out[t] = 0.0;
        cnt_out[t] = 0;
    }
    const long nseg = static_cast<long>(segments.size());
#pragma omp parallel if (nseg > 8)
    {
        std::vector<double> l1(max_lag + 1, 0.0), l2(max_lag + 1, 0.0);
        std::vector<long> lc(max_lag + 1, 0);
#pragma omp for schedule(dynamic, 1) nowait
        for (long g = 0; g < nseg; ++g) {
            const auto& seg = segments[g];
            const long L = static_cast<long>(seg.size());
            for (long t = 0; t <= max_lag && t < L; ++t) {
                for (long s = 0; s + t < L; ++s) {
                    double dot = seg[s][0] * seg[s + t][0]
                               + seg[s][1] * seg[s + t][1]
                               + seg[s][2] * seg[s + t][2];
                    l1[t] += dot;
                    l2[t] += 1.5 * dot * dot - 0.5;
                    ++lc[t];
                }
            }
        }
#pragma omp critical
        for (long t = 0; t <= max_lag; ++t) {
            c1_out[t] += l1[t];
            c2_out[t] += l2[t];
            cnt_out[t] += lc[t];
        }
    }
    for (long t = 0; t <= max_lag; ++t)
        if (cnt_out[t] > 0) {
            c1_out[t] /= static_cast<double>(cnt_out[t]);
            c2_out[t] /= static_cast<double>(cnt_out[t]);
        }
    return n_frames;
}

// Spherically-averaged static structure factor S(q) by the Debye
// formula over minimum-image pair distances (beyond-reference
// extension — the diffraction-side observable):
//   S_f(q) = 1 + (2 / N_f) * sum_{i<j} sin(q r_ij) / (q r_ij)
// averaged evenly over frames.  Pair distances are binned once per
// frame at resolution dr_bin (bin-center evaluation; error is
// O((q dr)^2) — keep q_max * dr_bin << 1), which turns the
// O(N^2 * nq) double loop into O(N^2 + nbins * nq).  Minimum-image
// truncation means pairs beyond half the cell are folded — the usual
// finite-size artifact at low q; interpret q below ~2*pi/L_half
// accordingly.  q values must be > 0.  Returns frames processed; -1 if
// any frame lacks a usable cell, -2 on bad arguments.
long traj_sq(void* h, const char* name_sel, char flag_sel,
             const double* fallback_cell, const double* q, long nq,
             double dr_bin, double* sq_out) {
    auto* file = static_cast<File*>(h);
    if (!file || nq <= 0 || !q || !sq_out || dr_bin <= 0) return -2;
    for (long k = 0; k < nq; ++k)
        if (q[k] <= 0.0) return -2;
    // N varies across GCMC frames: weight each frame's pair histogram
    // by its own 2/N_f as it is accumulated, then average frames evenly.
    std::vector<double> hist;       // sum over frames of (2/N_f) counts
    long n_frames = 0;
    std::vector<const Atom*> sel;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        sel.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.name, name_sel)
                && flag_match(a.flag, flag_sel))
                sel.push_back(&a);
        ++n_frames;
        const long n = static_cast<long>(sel.size());
        if (n < 2) continue;
        const double w = 2.0 / static_cast<double>(n);
        // min-image distances are bounded by half the cell-vector
        // perimeter: preallocate per-thread histograms to that size so
        // the parallel loop never reallocates (counts are multiples of
        // w, so thread merge order cannot change the result)
        double ext = 0.0;
        for (int kk = 0; kk < 3; ++kk)
            ext += std::sqrt(cell.b[kk][0] * cell.b[kk][0]
                             + cell.b[kk][1] * cell.b[kk][1]
                             + cell.b[kk][2] * cell.b[kk][2]);
        const auto nb = static_cast<size_t>(0.5 * ext / dr_bin) + 2;
        if (hist.size() < nb) hist.resize(nb, 0.0);
#pragma omp parallel if (n > 512)
        {
            std::vector<double> local(nb, 0.0);
#pragma omp for schedule(dynamic, 16) nowait
            for (long i = 0; i < n; ++i) {
                for (long j = i + 1; j < n; ++j) {
                    double d[3];
                    min_image(cell, sel[i]->x - sel[j]->x,
                              sel[i]->y - sel[j]->y,
                              sel[i]->z - sel[j]->z, d);
                    double r = std::sqrt(d[0] * d[0] + d[1] * d[1]
                                         + d[2] * d[2]);
                    auto k = static_cast<size_t>(r / dr_bin);
                    if (k >= nb) k = nb - 1;
                    local[k] += w;
                }
            }
#pragma omp critical
            for (size_t k = 0; k < nb; ++k) hist[k] += local[k];
        }
    }
    if (!file->error.empty()) return -3;
    for (long k = 0; k < nq; ++k) {
        double s = 0.0;
        for (size_t b = 0; b < hist.size(); ++b) {
            if (hist[b] == 0.0) continue;
            double r = (static_cast<double>(b) + 0.5) * dr_bin;
            double x = q[k] * r;
            s += hist[b] * std::sin(x) / x;
        }
        sq_out[k] = n_frames > 0
                        ? 1.0 + s / static_cast<double>(n_frames)
                        : 1.0;
    }
    return n_frames;
}

// Geometric pore characterization of the FIRST frame's selected atoms
// (beyond-reference extension — the standard MOF screening companions
// to the Widom/Henry machinery; cf. the reference's run-time cavity
// grid, SURVEY.md §2 "Cavity bias", which estimates open-cavity volume
// during a run).  Atoms are hard spheres of radius sig/2 (the LJ sigma
// column); atoms with sig <= 0 are ignored.
//
// For every sample point p (n_points of them) it reports
//   d_out[p] = min_i(|p - x_i| - sig_i/2)   surface distance, clamped
//              above by half the minimum perpendicular cell width (the
//              min-image validity cap; also the empty-selection value),
//              negative when p is inside an atom;
//   r_out[p] = Gelb-Gubbins pore radius: the largest d_surf(c) over
//              centers c (the n_centers candidate set, plus p itself)
//              whose fitted sphere covers p, i.e. |p - c| <= d_surf(c);
//              equals d_out[p] when no candidate sphere covers p, so
//              r_out >= d_out always, and r_out = d_out < 0 inside
//              atoms.
// Void fraction, pore-size histograms, and probe accessibility are
// formed by the caller from (d_out, r_out): a probe of radius r_p can
// CENTER at p iff d_out[p] >= r_p, and p lies in r_p-coverable void iff
// r_out[p] >= r_p.
//
// frac_pts [n_points*3] / frac_ctr [n_centers*3]: optional fractional
// coordinates (the cross-validation path); NULL draws uniform points
// from a mt19937_64 seeded stream — sample points first, then centers,
// in that documented order.  Returns 1 (frames used); -1 when the
// first frame lacks a usable cell, -2 on bad arguments, -3 on a parse
// error.
long traj_pore(void* h, const char* name_sel, char flag_sel,
               long n_points, long n_centers, unsigned long long seed,
               const double* frac_pts, const double* frac_ctr,
               const double* fallback_cell, double* d_out,
               double* r_out) {
    auto* file = static_cast<File*>(h);
    if (!file || n_points <= 0 || n_centers < 0 || !d_out || !r_out)
        return -2;
    const Frame* fr = first_frame(file);
    if (!fr) return file->error.empty() ? -2 : -3;
    Cell cell;
    if (!frame_cell(*fr, fallback_cell, &cell)) return -1;
    const double cap = half_min_width(cell);

    std::vector<double> ax, ay, az, ar;
    for (const Atom& a : fr->atoms)
        if (a.sig > 0.0 && name_match(a.name, name_sel)
            && flag_match(a.flag, flag_sel)) {
            ax.push_back(a.x);
            ay.push_back(a.y);
            az.push_back(a.z);
            ar.push_back(0.5 * a.sig);
        }
    const long na = static_cast<long>(ax.size());

    // serial pre-draw (identical stream regardless of thread count):
    // sample points first, then candidate centers
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    std::vector<double> pts_drawn, ctr_drawn;
    if (!frac_pts) {
        pts_drawn.resize(3 * n_points);
        for (double& v : pts_drawn) v = uni(rng);
        frac_pts = pts_drawn.data();
    }
    if (!frac_ctr && n_centers > 0) {
        ctr_drawn.resize(3 * n_centers);
        for (double& v : ctr_drawn) v = uni(rng);
        frac_ctr = ctr_drawn.data();
    }

    auto cart = [&cell](const double* f, long t, double* p) {
        for (int k = 0; k < 3; ++k)
            p[k] = f[3 * t] * cell.b[0][k] + f[3 * t + 1] * cell.b[1][k]
                 + f[3 * t + 2] * cell.b[2][k];
    };
    auto d_surf = [&](const double* p) {
        double best = cap;
        for (long i = 0; i < na; ++i) {
            double d[3];
            min_image(cell, p[0] - ax[i], p[1] - ay[i], p[2] - az[i], d);
            double v = std::sqrt(d[0] * d[0] + d[1] * d[1]
                                 + d[2] * d[2]) - ar[i];
            if (v < best) best = v;
        }
        return best;
    };

    std::vector<double> cx(n_centers), cy(n_centers), cz(n_centers),
        cd(n_centers);
#pragma omp parallel for schedule(static) \
    if (n_centers * (na + 1) > 20000)
    for (long t = 0; t < n_centers; ++t) {
        double p[3];
        cart(frac_ctr, t, p);
        cx[t] = p[0];
        cy[t] = p[1];
        cz[t] = p[2];
        cd[t] = d_surf(p);
    }
#pragma omp parallel for schedule(static) \
    if (n_points * (na + n_centers + 1) > 20000)
    for (long t = 0; t < n_points; ++t) {
        double p[3];
        cart(frac_pts, t, p);
        const double dp = d_surf(p);
        d_out[t] = dp;
        double best = dp;
        if (dp >= 0.0)
            for (long c = 0; c < n_centers; ++c) {
                if (cd[c] <= best) continue;   // cannot improve
                double d[3];
                min_image(cell, p[0] - cx[c], p[1] - cy[c],
                          p[2] - cz[c], d);
                double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
                if (r2 <= cd[c] * cd[c]) best = cd[c];
            }
        r_out[t] = best;
    }
    return 1;
}

// Accessible surface area of the FIRST frame's selected atoms by
// Shrake-Rupley sphere sampling (beyond-reference extension, same
// rationale as traj_pore).  Each selected atom i with sig > 0 carries a
// probe-inflated radius R_i = (sig_i + sig_probe)/2; n_sphere direction
// vectors (shared by every atom) place test points p = x_i + R_i*u,
// and p is accessible iff no OTHER selected atom j has
// |p - x_j| < R_j (minimum image).  The area sum is
//   ASA = sum_i 4*pi*R_i^2 * (accessible fraction of atom i).
//
// unit_pts [n_sphere*3]: optional unit direction vectors (the
// cross-validation path); NULL draws isotropic Gaussian directions
// from the seeded stream (3 normals per point, serial pre-draw).
// out[0] = area [A^2], out[1] = cell volume [A^3], out[2] = selected
// atoms' mass sum [amu] (sig <= 0 atoms count toward mass: they are
// part of the framework even when they carry no LJ site).  Returns 1;
// -1 when the first frame lacks a usable cell, -2 on bad arguments,
// -3 on a parse error.
// Connected-component cluster statistics of selected-molecule COMs:
// two molecules bond when their COM min-image distance is < rc
// (union-find over the O(M^2) pair graph; M = sorbate molecules per
// frame, typically a few hundred).  Per frame, 3 numbers go to
// series_out [n_frames*3]: cluster count, mean cluster size, and the
// largest cluster's fraction of the selected molecules; the pooled
// cluster-size histogram goes to hist_out [max_size] (a cluster of
// size s increments bin min(s, max_size) - 1; caller zero-inits).
// Returns frames processed; -1 if a frame lacks a usable cell, -2 on
// bad arguments, -3 on a parse error.
long traj_cluster(void* h, const char* mol_name, char flag_sel,
                  double rc, const double* fallback_cell,
                  long max_size, double* series_out, double* hist_out) {
    auto* file = static_cast<File*>(h);
    if (!file || rc <= 0.0 || max_size <= 0) return -2;
    const double rc2 = rc * rc;
    long n_frames = 0;
    std::map<long, std::vector<const Atom*>> mols;
    std::vector<double> coms;
    std::vector<long> parent, csize;
    mpmc_native::rewind_frames(file);
    while (const Frame* fr_p = mpmc_native::next_frame(file)) {
        const Frame& fr = *fr_p;
        Cell cell;
        if (!frame_cell(fr, fallback_cell, &cell)) return -1;
        mols.clear();
        for (const Atom& a : fr.atoms)
            if (name_match(a.mol_name, mol_name)
                && flag_match(a.flag, flag_sel))
                mols[a.mol_id].push_back(&a);
        const long m = static_cast<long>(mols.size());
        coms.resize(3 * m);
        long i = 0;
        for (const auto& kv : mols)
            mol_com(cell, kv.second, &coms[3 * i++]);
        parent.resize(m);
        for (long k = 0; k < m; ++k) parent[k] = k;
        // path-halving find
        auto find = [&](long x) {
            while (parent[x] != x) {
                parent[x] = parent[parent[x]];
                x = parent[x];
            }
            return x;
        };
        for (long a = 0; a < m; ++a)
            for (long b = a + 1; b < m; ++b) {
                double d[3];
                min_image(cell, coms[3 * a] - coms[3 * b],
                          coms[3 * a + 1] - coms[3 * b + 1],
                          coms[3 * a + 2] - coms[3 * b + 2], d);
                if (d[0] * d[0] + d[1] * d[1] + d[2] * d[2] < rc2) {
                    long ra = find(a), rb = find(b);
                    if (ra != rb) parent[ra] = rb;
                }
            }
        csize.assign(m, 0);
        for (long k = 0; k < m; ++k) ++csize[find(k)];
        long n_cl = 0, largest = 0;
        for (long k = 0; k < m; ++k)
            if (csize[k] > 0) {
                ++n_cl;
                if (csize[k] > largest) largest = csize[k];
                long bin = csize[k] < max_size ? csize[k] : max_size;
                hist_out[bin - 1] += 1.0;
            }
        series_out[3 * n_frames] = static_cast<double>(n_cl);
        series_out[3 * n_frames + 1] =
            n_cl > 0 ? static_cast<double>(m) / n_cl : 0.0;
        series_out[3 * n_frames + 2] =
            m > 0 ? static_cast<double>(largest) / m : 0.0;
        ++n_frames;
    }
    if (!file->error.empty()) return -3;
    return n_frames;
}

long traj_asa(void* h, const char* name_sel, char flag_sel,
              double sig_probe, long n_sphere, unsigned long long seed,
              const double* unit_pts, const double* fallback_cell,
              double* out) {
    auto* file = static_cast<File*>(h);
    if (!file || n_sphere <= 0 || sig_probe < 0.0 || !out) return -2;
    const Frame* fr = first_frame(file);
    if (!fr) return file->error.empty() ? -2 : -3;
    Cell cell;
    if (!frame_cell(*fr, fallback_cell, &cell)) return -1;

    std::vector<double> ax, ay, az, aR;
    double mass = 0.0;
    for (const Atom& a : fr->atoms)
        if (name_match(a.name, name_sel)
            && flag_match(a.flag, flag_sel)) {
            mass += a.mass;
            if (a.sig <= 0.0) continue;
            ax.push_back(a.x);
            ay.push_back(a.y);
            az.push_back(a.z);
            aR.push_back(0.5 * (a.sig + sig_probe));
        }
    const long na = static_cast<long>(ax.size());

    std::vector<double> dirs;
    if (!unit_pts) {
        dirs.resize(3 * n_sphere);
        std::mt19937_64 rng(seed);
        std::normal_distribution<double> gauss(0.0, 1.0);
        for (long t = 0; t < n_sphere; ++t) {
            double v[3] = {gauss(rng), gauss(rng), gauss(rng)};
            double n = std::sqrt(v[0] * v[0] + v[1] * v[1]
                                 + v[2] * v[2]);
            if (n < 1e-12) { v[0] = 1.0; n = 1.0; }
            for (int k = 0; k < 3; ++k) dirs[3 * t + k] = v[k] / n;
        }
        unit_pts = dirs.data();
    }

    double area = 0.0;
#pragma omp parallel for reduction(+:area) schedule(dynamic, 4) \
    if (na * n_sphere > 20000)
    for (long i = 0; i < na; ++i) {
        long acc = 0;
        for (long t = 0; t < n_sphere; ++t) {
            double p[3] = {ax[i] + aR[i] * unit_pts[3 * t],
                           ay[i] + aR[i] * unit_pts[3 * t + 1],
                           az[i] + aR[i] * unit_pts[3 * t + 2]};
            bool open = true;
            for (long j = 0; j < na; ++j) {
                if (j == i) continue;
                double d[3];
                min_image(cell, p[0] - ax[j], p[1] - ay[j],
                          p[2] - az[j], d);
                double r2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
                if (r2 < aR[j] * aR[j]) { open = false; break; }
            }
            if (open) ++acc;
        }
        area += 4.0 * M_PI * aR[i] * aR[i] * static_cast<double>(acc)
              / static_cast<double>(n_sphere);
    }
    out[0] = area;
    out[1] = cell.volume;
    out[2] = mass;
    return 1;
}

}  // extern "C"
