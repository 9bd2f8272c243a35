// kinpoly_native — host-side native kernels for asset/data preprocessing.
//
// The TPU compute path is JAX/XLA; this library covers the host runtime
// around it (the role MuJoCo's C core and LAPACK play for the reference):
//   - binary STL triangle soup -> deduplicated vertex/face arrays
//   - exact mesh mass properties (volume integrals, signed tetrahedra)
//   - farthest-point contact-vertex selection
//   - batched expert-clip window gather (the data-loader hot loop)
//
// Exposed as a plain C ABI consumed through ctypes
// (kinpoly_tpu/utils/native.py); every entry point has a numpy fallback so
// the framework works without the compiled library.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libkinpoly_native.so kinpoly_native.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// STL parsing
// ---------------------------------------------------------------------------

struct Key3 {
    float x, y, z;
    bool operator==(const Key3& o) const { return x == o.x && y == o.y && z == o.z; }
};

struct Key3Hash {
    size_t operator()(const Key3& k) const {
        // bit-mix the raw float patterns
        uint32_t a, b, c;
        std::memcpy(&a, &k.x, 4);
        std::memcpy(&b, &k.y, 4);
        std::memcpy(&c, &k.z, 4);
        size_t h = a;
        h = h * 1000003u ^ b;
        h = h * 1000003u ^ c;
        return h;
    }
};

// Parse a binary STL buffer. Returns number of unique vertices, writes
// deduplicated vertices (float64 x3) and int32 faces (x3). Caller provides
// buffers sized for the worst case (3 * ntri vertices).
int kp_parse_stl(const uint8_t* buf, int64_t len,
                 double* out_verts, int32_t* out_faces,
                 int32_t* out_nvert, int32_t* out_ntri) {
    if (len < 84) return -1;
    uint32_t ntri;
    std::memcpy(&ntri, buf + 80, 4);
    if (84 + (int64_t)ntri * 50 > len) return -2;

    std::unordered_map<Key3, int32_t, Key3Hash> index;
    index.reserve(ntri * 3);
    int32_t nv = 0;

    for (uint32_t t = 0; t < ntri; t++) {
        const uint8_t* rec = buf + 84 + (int64_t)t * 50 + 12;  // skip normal
        for (int corner = 0; corner < 3; corner++) {
            Key3 k;
            std::memcpy(&k, rec + corner * 12, 12);
            auto it = index.find(k);
            int32_t vid;
            if (it == index.end()) {
                vid = nv++;
                index.emplace(k, vid);
                out_verts[vid * 3 + 0] = (double)k.x;
                out_verts[vid * 3 + 1] = (double)k.y;
                out_verts[vid * 3 + 2] = (double)k.z;
            } else {
                vid = it->second;
            }
            out_faces[t * 3 + corner] = vid;
        }
    }
    *out_nvert = nv;
    *out_ntri = (int32_t)ntri;
    return 0;
}

// ---------------------------------------------------------------------------
// mesh mass properties (signed tetrahedra about the origin)
// ---------------------------------------------------------------------------

int kp_mesh_mass_properties(const double* verts, const int32_t* faces,
                            int32_t ntri, double density,
                            double* out_mass, double* out_com,
                            double* out_inertia /* 9 doubles, row major */) {
    double vol6 = 0.0;
    double com4[3] = {0, 0, 0};
    double C[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};

    for (int32_t t = 0; t < ntri; t++) {
        const double* a = verts + faces[t * 3 + 0] * 3;
        const double* b = verts + faces[t * 3 + 1] * 3;
        const double* c = verts + faces[t * 3 + 2] * 3;
        double cross[3] = {
            b[1] * c[2] - b[2] * c[1],
            b[2] * c[0] - b[0] * c[2],
            b[0] * c[1] - b[1] * c[0],
        };
        double d = a[0] * cross[0] + a[1] * cross[1] + a[2] * cross[2];
        vol6 += d;
        for (int i = 0; i < 3; i++) com4[i] += d * (a[i] + b[i] + c[i]);
        for (int i = 0; i < 3; i++)
            for (int j = 0; j < 3; j++) {
                double s = 2.0 * (a[i] * a[j] + b[i] * b[j] + c[i] * c[j]) +
                           a[i] * b[j] + a[j] * b[i] + a[i] * c[j] + a[j] * c[i] +
                           b[i] * c[j] + b[j] * c[i];
                C[i][j] += d * s;
            }
    }

    double vol = vol6 / 6.0;
    double mass = vol * density;
    double com[3];
    for (int i = 0; i < 3; i++) com[i] = com4[i] / 24.0 / vol;

    double trC = 0.0;
    for (int i = 0; i < 3; i++) trC += C[i][i] * density / 120.0;
    double I0[3][3];
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++)
            I0[i][j] = (i == j ? trC : 0.0) - C[i][j] * density / 120.0;

    double r2 = com[0] * com[0] + com[1] * com[1] + com[2] * com[2];
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++)
            out_inertia[i * 3 + j] =
                I0[i][j] - mass * ((i == j ? r2 : 0.0) - com[i] * com[j]);

    *out_mass = mass;
    for (int i = 0; i < 3; i++) out_com[i] = com[i];
    return 0;
}

// ---------------------------------------------------------------------------
// farthest-point vertex selection (contact candidate downsampling)
// ---------------------------------------------------------------------------

int kp_farthest_point_select(const double* verts, int32_t nvert,
                             const int32_t* seed_idx, int32_t nseed,
                             int32_t k, int32_t* out_idx) {
    std::vector<double> dmin(nvert, 1e30);
    // start from the seed with lowest z
    int32_t first = seed_idx[0];
    for (int32_t s = 1; s < nseed; s++)
        if (verts[seed_idx[s] * 3 + 2] < verts[first * 3 + 2]) first = seed_idx[s];

    int32_t cur = first;
    for (int32_t c = 0; c < k; c++) {
        out_idx[c] = cur;
        double best = -1.0;
        int32_t best_i = cur;
        for (int32_t s = 0; s < nseed; s++) {
            int32_t v = seed_idx[s];
            double dx = verts[v * 3] - verts[cur * 3];
            double dy = verts[v * 3 + 1] - verts[cur * 3 + 1];
            double dz = verts[v * 3 + 2] - verts[cur * 3 + 2];
            double d = dx * dx + dy * dy + dz * dz;
            if (d < dmin[v]) dmin[v] = d;
            if (dmin[v] > best) { best = dmin[v]; best_i = v; }
        }
        cur = best_i;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// batched clip-window gather: out[b] = clip[starts[b] : starts[b]+T] with
// last-frame padding (the StateAR / expert window sampler hot loop)
// ---------------------------------------------------------------------------

int kp_gather_windows(const float* clip, int32_t clip_len, int32_t dim,
                      const int32_t* starts, int32_t n_windows,
                      int32_t win_len, float* out) {
    for (int32_t b = 0; b < n_windows; b++) {
        int32_t s = starts[b];
        for (int32_t t = 0; t < win_len; t++) {
            int32_t src = s + t;
            if (src >= clip_len) src = clip_len - 1;
            std::memcpy(out + ((int64_t)b * win_len + t) * dim,
                        clip + (int64_t)src * dim, sizeof(float) * dim);
        }
    }
    return 0;
}

}  // extern "C"
