// Native .g2o text parser: the framework's bulk data loader.
//
// The reference's data path is C++ end to end (g2o's text IO parses the
// graphs it saves at /root/reference/src/slam/graph_slam.cpp:620-628; scan
// payloads ride ROBOTLASER1 userData lines). This loader replaces the
// Python tokenizer for large files: one pass to count, one pass to fill
// caller-allocated numpy buffers — no per-line Python objects. Exposed
// through ctypes (cg_mrslam_tpu/native/__init__.py); io/g2o.py uses it
// when available and falls back to the pure-Python parser otherwise.
//
// Build: g++ -O3 -shared -fPIC g2o_parser.cpp -o libg2o_parser.so

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include <string>

namespace {

struct Tok {
    char *p;
    char *end;
    explicit Tok(char *line, size_t n) : p(line), end(line + n) {}
    bool next(char **out) {
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p >= end || *p == '\n' || *p == '\r' || *p == '\0') return false;
        *out = p;
        while (p < end && *p != ' ' && *p != '\t' && *p != '\n' &&
               *p != '\r' && *p != '\0')
            ++p;
        if (p < end) { *p = '\0'; ++p; }
        return true;
    }
    bool next_d(double *out) {
        char *t;
        if (!next(&t)) return false;
        *out = strtod(t, nullptr);
        return true;
    }
    bool next_ll(long long *out) {
        char *t;
        if (!next(&t)) return false;
        *out = strtoll(t, nullptr, 10);
        return true;
    }
};

struct FileBuf {
    std::vector<char> data;
    bool ok = false;
    explicit FileBuf(const char *path) {
        FILE *f = fopen(path, "rb");
        if (!f) return;
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        data.resize((size_t)n + 1);
        ok = fread(data.data(), 1, (size_t)n, f) == (size_t)n;
        data[(size_t)n] = '\0';
        fclose(f);
    }
};

}  // namespace

extern "C" {

// First pass: counts. Returns 0 on success.
int g2o_count(const char *path, long long *n_vertices, long long *n_edges,
              long long *n_lasers, long long *max_beams) {
    FileBuf fb(path);
    if (!fb.ok) return -1;
    long long nv = 0, ne = 0, nl = 0, mb = 0;
    char *s = fb.data.data();
    char *end = s + fb.data.size();
    while (s < end) {
        char *eol = (char *)memchr(s, '\n', (size_t)(end - s));
        if (!eol) eol = end;
        if (!strncmp(s, "VERTEX_SE2 ", 11)) {
            ++nv;
        } else if (!strncmp(s, "EDGE_SE2 ", 9)) {
            ++ne;
        } else if (!strncmp(s, "ROBOTLASER1 ", 12)) {
            ++nl;
            // beams = 8th numeric field (type fba fov step maxr acc remission beams)
            Tok tok(s + 12, (size_t)(eol - s - 12));
            double d;
            long long beams = 0;
            for (int k = 0; k < 7; ++k) tok.next_d(&d);
            tok.next_ll(&beams);
            if (beams > mb) mb = beams;
        }
        s = eol + 1;
    }
    *n_vertices = nv;
    *n_edges = ne;
    *n_lasers = nl;
    *max_beams = mb;
    return 0;
}

// Second pass: fill caller-allocated buffers.
//   v_ids      [nv]     int64
//   v_pose     [nv*3]   double
//   v_fixed    [nv]     uint8   (from FIX lines)
//   e_ids      [ne*2]   int64
//   e_z        [ne*3]   double
//   e_info     [ne*6]   double  (xx xy xt yy yt tt)
//   l_vertex   [nl]     int64   (index into the vertex arrays)
//   l_meta     [nl*10]  double  (fba fov step maxr laserPose3 odomPose3)
//   l_ranges   [nl*max_beams] double (padded with maxr)
int g2o_parse(const char *path, long long max_beams,
              long long *v_ids, double *v_pose, uint8_t *v_fixed,
              long long *e_ids, double *e_z, double *e_info,
              long long *l_vertex, double *l_meta, double *l_ranges) {
    FileBuf fb(path);
    if (!fb.ok) return -1;
    long long nv = 0, ne = 0, nl = 0;
    char *s = fb.data.data();
    char *end = s + fb.data.size();
    while (s < end) {
        char *eol = (char *)memchr(s, '\n', (size_t)(end - s));
        if (!eol) eol = end;
        size_t len = (size_t)(eol - s);
        if (!strncmp(s, "VERTEX_SE2 ", 11)) {
            Tok tok(s + 11, len - 11);
            long long id;
            double x, y, th;
            if (tok.next_ll(&id) && tok.next_d(&x) && tok.next_d(&y) &&
                tok.next_d(&th)) {
                v_ids[nv] = id;
                v_pose[3 * nv] = x;
                v_pose[3 * nv + 1] = y;
                v_pose[3 * nv + 2] = th;
                v_fixed[nv] = 0;
                ++nv;
            }
        } else if (!strncmp(s, "EDGE_SE2 ", 9)) {
            Tok tok(s + 9, len - 9);
            long long i, j;
            double vals[9];
            bool ok = tok.next_ll(&i) && tok.next_ll(&j);
            for (int k = 0; ok && k < 9; ++k) ok = tok.next_d(&vals[k]);
            if (ok) {
                e_ids[2 * ne] = i;
                e_ids[2 * ne + 1] = j;
                for (int k = 0; k < 3; ++k) e_z[3 * ne + k] = vals[k];
                for (int k = 0; k < 6; ++k) e_info[6 * ne + k] = vals[3 + k];
                ++ne;
            }
        } else if (!strncmp(s, "FIX ", 4)) {
            Tok tok(s + 4, len - 4);
            long long id;
            while (tok.next_ll(&id)) {
                for (long long k = nv - 1; k >= 0; --k) {
                    if (v_ids[k] == id) { v_fixed[k] = 1; break; }
                }
            }
        } else if (!strncmp(s, "ROBOTLASER1 ", 12)) {
            // g2o robot_laser field order (g2o robot_laser.cpp):
            // type fba fov step maxRange accuracy remission beams r[beams]
            // remCount [rem...] laserPose(3) odomPose(3) tv rv fa lts
            Tok tok(s + 12, len - 12);
            double type, fba, fov, step, maxr, acc;
            long long remis = 0, beams = 0;
            bool ok = tok.next_d(&type) && tok.next_d(&fba) &&
                      tok.next_d(&fov) && tok.next_d(&step) &&
                      tok.next_d(&maxr) && tok.next_d(&acc) &&
                      tok.next_ll(&remis) && tok.next_ll(&beams);
            if (ok && beams <= max_beams) {
                double *r = l_ranges + nl * max_beams;
                for (long long k = 0; k < beams && ok; ++k)
                    ok = tok.next_d(&r[k]);
                for (long long k = beams; k < max_beams; ++k) r[k] = maxr;
                long long nrem = 0;
                ok = ok && tok.next_ll(&nrem);
                double d;
                for (long long k = 0; k < nrem && ok; ++k) ok = tok.next_d(&d);
                double lp[3], op[3];
                for (int k = 0; k < 3 && ok; ++k) ok = tok.next_d(&lp[k]);
                for (int k = 0; k < 3 && ok; ++k) ok = tok.next_d(&op[k]);
                if (ok) {
                    l_vertex[nl] = nv - 1;  // attaches to preceding vertex
                    double *m = l_meta + 10 * nl;
                    m[0] = fba; m[1] = fov; m[2] = step; m[3] = maxr;
                    m[4] = lp[0]; m[5] = lp[1]; m[6] = lp[2];
                    m[7] = op[0]; m[8] = op[1]; m[9] = op[2];
                    ++nl;
                }
            }
        }
        s = eol + 1;
    }
    return 0;
}

}  // extern "C"
