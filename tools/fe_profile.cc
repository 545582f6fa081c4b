// Replay harness for profiling the native front-end CTU walk.
//
// Reads .slice dumps produced by OPENHEVC_DUMP_SLICE (one serialized
// decode_slice_data call each; see native/__init__.py _dump_slice_call) and
// replays them in a loop.  Build together with frontend.cc, e.g.:
//   g++ -O2 -pg -std=c++17 tools/fe_profile.cc -o /tmp/fe_prof
//   /tmp/fe_prof /tmp/slices 20 && gprof /tmp/fe_prof gmon.out
// (frontend.cc is #included so -pg instruments its statics too.)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <string>
#include <vector>
#include <algorithm>
#include <chrono>

#include "../openhevc_tpu/native/frontend.cc"

struct Blob {
    std::vector<uint8_t> bytes;
    int64_t scalar = 0;
    bool is_scalar = false;
};

static bool read_blob(FILE *f, Blob &b) {
    int64_t n;
    if (fread(&n, 8, 1, f) != 1) return false;
    if (n == -8) {
        b.is_scalar = true;
        if (fread(&b.scalar, 8, 1, f) != 1) return false;
        return true;
    }
    b.bytes.resize(n);
    if (n && fread(b.bytes.data(), 1, n, f) != (size_t)n) return false;
    return true;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <dump_dir> [reps]\n", argv[0]);
        return 1;
    }
    int reps = argc > 2 ? atoi(argv[2]) : 10;
    std::vector<std::string> files;
    DIR *d = opendir(argv[1]);
    if (!d) { perror("opendir"); return 1; }
    struct dirent *e;
    while ((e = readdir(d)))
        if (strstr(e->d_name, ".slice"))
            files.push_back(std::string(argv[1]) + "/" + e->d_name);
    closedir(d);
    std::sort(files.begin(), files.end());

    // load all calls up front
    struct Call { Blob params, seg; std::vector<Blob> args; };
    std::vector<Call> calls;
    for (auto &path : files) {
        FILE *f = fopen(path.c_str(), "rb");
        if (!f) continue;
        Call c;
        if (!read_blob(f, c.params) || !read_blob(f, c.seg)) {
            fclose(f); continue;
        }
        Blob b;
        while (read_blob(f, b)) { c.args.push_back(b); b = Blob(); }
        fclose(f);
        calls.push_back(std::move(c));
    }
    fprintf(stderr, "loaded %zu slice calls\n", calls.size());

    // pristine copies: calls mutate their buffers (scratch/ctx/qp are read
    // as neighbour context), so replays after rep 1 would desync and decode
    // garbage without a restore; the restore runs OUTSIDE the timer
    std::vector<std::vector<std::vector<uint8_t>>> pristine(calls.size());
    for (size_t k = 0; k < calls.size(); k++)
        for (auto &b : calls[k].args)
            pristine[k].push_back(b.bytes);

    double total = 0.0;
    int64_t out_sizes[4];
    int nerr = 0;
    std::vector<int32_t> ops, levels;       // reused across replays
    for (int r = 0; r < reps; r++) {
        for (size_t k = 0; k < calls.size(); k++) {
            auto &c = calls[k];
            for (size_t j = 0; j < c.args.size(); j++)
                if (!c.args[j].is_scalar)
                    memcpy(c.args[j].bytes.data(), pristine[k][j].data(),
                           pristine[k][j].size());
            std::vector<Blob> &a = c.args;
            auto P = (const SliceParams *)c.params.bytes.data();
            int i = 0;
            auto nb = [&]() { return a[i++].bytes.data(); };
            const int32_t *rs2ts = (int32_t *)nb(), *ts2rs = (int32_t *)nb(),
                          *tid = (int32_t *)nb(), *zsc = (int32_t *)nb(),
                          *rpl0 = (int32_t *)nb(), *rpl1 = (int32_t *)nb(),
                          *col_mv = (int32_t *)nb(),
                          *col_poc = (int32_t *)nb();
            const uint8_t *col_pred = nb();
            const int8_t *col_ri = (int8_t *)nb();
            const int32_t *col_rpl0 = (int32_t *)nb(),
                          *col_rpl1 = (int32_t *)nb();
            int64_t ops_cap = a[i++].scalar;
            int64_t lv_cap = a[i++].scalar;
            if ((int64_t)ops.size() < ops_cap) ops.resize(ops_cap);
            if ((int64_t)levels.size() < lv_cap) levels.resize(lv_cap);
            int32_t *mvf_mv = (int32_t *)nb(), *mvf_poc = (int32_t *)nb();
            uint8_t *mvf_pred = nb();
            int8_t *mvf_ri = (int8_t *)nb();
            uint8_t *vbs = nb(), *hbs = nb();
            int8_t *qp_y_tab = (int8_t *)nb();
            uint8_t *pcm_map = nb();
            int32_t *sao_out = (int32_t *)nb();
            uint8_t *cbf = nb(), *scratch = nb(), *ctx_io = nb();
            int32_t *rext = (int32_t *)nb();
            auto t0 = std::chrono::steady_clock::now();
            decode_slice_data(P, c.seg.bytes.data(), c.seg.bytes.size(),
                              rs2ts, ts2rs, tid, zsc, rpl0, rpl1,
                              col_mv, col_poc, col_pred, col_ri,
                              col_rpl0, col_rpl1,
                              ops.data(), ops_cap, levels.data(), lv_cap,
                              mvf_mv, mvf_poc, mvf_pred, mvf_ri,
                              vbs, hbs, qp_y_tab, pcm_map, sao_out,
                              cbf, scratch, ctx_io, rext, out_sizes);
            total += std::chrono::duration<double>(
                std::chrono::steady_clock::now() - t0).count();
            if (out_sizes[2] != 0 && nerr++ < 5)
                fprintf(stderr, "err %lld on a call\n",
                        (long long)out_sizes[2]);
        }
    }
    double dt = total;
    fprintf(stderr, "%d reps x %zu calls in %.3fs -> %.1f ms/rep (%d errs)\n",
            reps, calls.size(), dt, dt / reps * 1000, nerr);
#ifdef FE_STATS
    fe_stats_print(dt);
#endif
    return 0;
}
