/* Golden-image driver for the C++ reference renderer.
 *
 * Builds the exact Cornell-box scene of core_tpu/scenes.py:cornell_box()
 * through the embedding API (yafrayInterface_t, reference
 * src/interface/yafrayinterface.cc) with plugins statically linked
 * (each plugin TU compiled with -DregisterPlugin=registerPlugin_<name>),
 * renders with the requested integrator and writes the float framebuffer
 * as a .npy for comparison against the TPU renderer.
 *
 * Usage: refdriver <integrator:directlighting|pathtracing> <spp> <res> <out.npy> [light_samples]
 */
#include <interface/yafrayinterface.h>
#include <core_api/environment.h>
#include <core_api/material.h>
#include <core_api/matrix4.h>
#include <yafraycore/memoryIO.h>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <sys/time.h>

using namespace yafaray;

extern "C" {
void registerPlugin_directlight(renderEnvironment_t &);
void registerPlugin_pathtracer(renderEnvironment_t &);
void registerPlugin_photonmapping(renderEnvironment_t &);
void registerPlugin_sppm(renderEnvironment_t &);
void registerPlugin_bidirectional(renderEnvironment_t &);
void registerPlugin_emptyvol(renderEnvironment_t &);
void registerPlugin_shinydiffuse(renderEnvironment_t &);
void registerPlugin_simplemat(renderEnvironment_t &);
void registerPlugin_arealight(renderEnvironment_t &);
void registerPlugin_cameras(renderEnvironment_t &);
void registerPlugin_glossy(renderEnvironment_t &);
void registerPlugin_glass(renderEnvironment_t &);
void registerPlugin_blend(renderEnvironment_t &);
}

class goldenIface_t : public yafrayInterface_t {
public:
    renderEnvironment_t *getEnv() { return env; }
};

static void addQuad(yafrayInterface_t &yi, material_t *mat,
                    const double p[4][3]) {
    int idx[4];
    for (int k = 0; k < 4; ++k)
        idx[k] = yi.addVertex(p[k][0], p[k][1], p[k][2]);
    yi.addTriangle(idx[0], idx[1], idx[2], mat);
    yi.addTriangle(idx[0], idx[2], idx[3], mat);
}

static void addBox(yafrayInterface_t &yi, material_t *mat,
                   const double corner[3], double sx, double sz, double h,
                   double angleDeg) {
    double c = std::cos(angleDeg * M_PI / 180.0);
    double s = std::sin(angleDeg * M_PI / 180.0);
    // rot = [[c,0,-s],[0,1,0],[s,0,c]] applied to (sx,0,0) and (0,0,sz)
    double dx[3] = {c * sx, 0.0, s * sx};
    double dz[3] = {-s * sz, 0.0, c * sz};
    double dy[3] = {0.0, h, 0.0};
    double p[4][3], q[4][3];
    for (int i = 0; i < 3; ++i) {
        p[0][i] = corner[i];
        p[1][i] = corner[i] + dx[i];
        p[2][i] = corner[i] + dx[i] + dz[i];
        p[3][i] = corner[i] + dz[i];
        for (int k = 0; k < 4; ++k) q[k][i] = p[k][i] + dy[i];
    }
    double f[4][3];
    auto quad = [&](const double *a, const double *b, const double *cc,
                    const double *d) {
        memcpy(f[0], a, 24); memcpy(f[1], b, 24);
        memcpy(f[2], cc, 24); memcpy(f[3], d, 24);
        addQuad(yi, mat, f);
    };
    quad(q[0], q[1], q[2], q[3]);   // top
    quad(p[1], p[0], q[0], q[1]);   // front
    quad(p[2], p[1], q[1], q[2]);   // right
    quad(p[3], p[2], q[2], q[3]);   // back
    quad(p[0], p[3], q[3], q[0]);   // left
    quad(p[3], p[2], p[1], p[0]);   // bottom
}

static void writeNpy(const char *path, const float *data, int h, int w,
                     int ch) {
    char hdr[256];
    snprintf(hdr, sizeof hdr,
             "{'descr': '<f4', 'fortran_order': False, 'shape': (%d, %d, %d), }",
             h, w, ch);
    size_t hl = strlen(hdr);
    size_t total = 10 + hl;
    size_t pad = (64 - (total % 64)) % 64;
    FILE *f = fopen(path, "wb");
    fwrite("\x93NUMPY\x01\x00", 1, 8, f);
    unsigned short len = (unsigned short)(hl + pad + 1);
    fwrite(&len, 2, 1, f);
    fwrite(hdr, 1, hl, f);
    for (size_t i = 0; i < pad; ++i) fputc(' ', f);
    fputc('\n', f);
    fwrite(data, sizeof(float), (size_t)h * w * ch, f);
    fclose(f);
}

int main(int argc, char **argv) {
    std::string integ = argc > 1 ? argv[1] : "directlighting";
    int spp = argc > 2 ? atoi(argv[2]) : 64;
    int res = argc > 3 ? atoi(argv[3]) : 256;
    const char *out = argc > 4 ? argv[4] : "golden.npy";
    int lsamples = argc > 5 ? atoi(argv[5]) : 16;
    double lpower = 30.0;

    goldenIface_t yi;
    renderEnvironment_t *env = yi.getEnv();
    registerPlugin_directlight(*env);
    registerPlugin_pathtracer(*env);
    registerPlugin_photonmapping(*env);
    registerPlugin_sppm(*env);
    registerPlugin_bidirectional(*env);
    registerPlugin_emptyvol(*env);
    registerPlugin_shinydiffuse(*env);
    registerPlugin_simplemat(*env);
    registerPlugin_arealight(*env);
    registerPlugin_cameras(*env);
    registerPlugin_glossy(*env);
    registerPlugin_glass(*env);
    registerPlugin_blend(*env);

    yi.setVerbosityWarning();
    yi.startScene();

    // --- materials (core_tpu/scenes.py:52-58) ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 0.75f, 0.75f, 0.75f);
    material_t *white = yi.createMaterial("white");
    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 0.63f, 0.065f, 0.05f);
    material_t *red = yi.createMaterial("red");
    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 0.14f, 0.45f, 0.091f);
    material_t *green = yi.createMaterial("green");
    yi.paramsClearAll();
    yi.paramsSetString("type", "light_mat");
    yi.paramsSetColor("color", 1.f, 1.f, 1.f);
    yi.paramsSetFloat("power", lpower);
    material_t *lightm = yi.createMaterial("lightmat");

    // specular block materials (scenes.py cornell_box block_materials)
    std::string blocks_mode = argc > 8 ? argv[8] : "";
    bool specular_blocks = blocks_mode == "specular" || blocks_mode == "blend";
    material_t *short_mat = white, *tall_mat = white;
    if (specular_blocks) {
        yi.paramsClearAll();
        yi.paramsSetString("type", "glossy");
        yi.paramsSetColor("color", 0.8f, 0.8f, 0.8f);
        yi.paramsSetColor("diffuse_color", 0.3f, 0.3f, 0.3f);
        yi.paramsSetFloat("glossy_reflect", 0.7);
        yi.paramsSetFloat("diffuse_reflect", 1.0);
        yi.paramsSetFloat("exponent", 120.0);
        yi.paramsSetBool("as_diffuse", false);
        short_mat = yi.createMaterial("glossymat");
        yi.paramsClearAll();
        yi.paramsSetString("type", "glass");
        yi.paramsSetFloat("IOR", 1.5);
        yi.paramsSetColor("filter_color", 1.f, 1.f, 1.f);
        yi.paramsSetFloat("transmit_filter", 1.0);
        tall_mat = yi.createMaterial("glassmat");
    }
    if (blocks_mode == "blend") {
        // cross-family blend (glossy (+) glass) on the tall block and a
        // same-family blend (white (+) red shinydiffuse) on the short one
        // — the blend.cc evaluated-BSDF mixture oracle for
        // core_tpu/scene.py's blend resolution (round-3 verdict weak #6)
        yi.paramsClearAll();
        yi.paramsSetString("type", "blend_mat");
        yi.paramsSetString("material1", "glossymat");
        yi.paramsSetString("material2", "glassmat");
        yi.paramsSetFloat("blend_value", 0.5);
        tall_mat = yi.createMaterial("blendcross");
        yi.paramsClearAll();
        yi.paramsSetString("type", "blend_mat");
        yi.paramsSetString("material1", "white");
        yi.paramsSetString("material2", "red");
        yi.paramsSetFloat("blend_value", 0.35);
        short_mat = yi.createMaterial("blenddiff");
    }

    // --- geometry (scenes.py:78-117) ---
    yi.startGeometry();
    unsigned int meshID = yi.getNextFreeID();
    yi.startTriMesh(meshID, 4 * 5 + 24 * 2, 2 * 5 + 12 * 2, false, false, 0);
    {
        double q[4][3];
        auto setq = [&](double a0, double a1, double a2, double b0, double b1,
                        double b2, double c0, double c1, double c2, double d0,
                        double d1, double d2) {
            q[0][0] = a0; q[0][1] = a1; q[0][2] = a2;
            q[1][0] = b0; q[1][1] = b1; q[1][2] = b2;
            q[2][0] = c0; q[2][1] = c1; q[2][2] = c2;
            q[3][0] = d0; q[3][1] = d1; q[3][2] = d2;
        };
        // floor
        setq(552.8, 0, 0, 0, 0, 0, 0, 0, 559.2, 549.6, 0, 559.2);
        addQuad(yi, white, q);
        // ceiling
        setq(556, 548.8, 0, 556, 548.8, 559.2, 0, 548.8, 559.2, 0, 548.8, 0);
        addQuad(yi, white, q);
        // back wall
        setq(549.6, 0, 559.2, 0, 0, 559.2, 0, 548.8, 559.2, 556, 548.8, 559.2);
        addQuad(yi, white, q);
        // right wall (green)
        setq(0, 0, 559.2, 0, 0, 0, 0, 548.8, 0, 0, 548.8, 559.2);
        addQuad(yi, green, q);
        // left wall (red)
        setq(552.8, 0, 0, 549.6, 0, 559.2, 556, 548.8, 559.2, 556, 548.8, 0);
        addQuad(yi, red, q);
        double c1[3] = {130.0, 0.0, 65.0};
        addBox(yi, short_mat, c1, 160, 160, 165, -18.0);
        double c2[3] = {265.0, 0.0, 296.0};
        addBox(yi, tall_mat, c2, 160, 160, 330, 17.0);
    }
    yi.endTriMesh();

    // light geometry quad (emissive material), linked to the arealight
    double lc[3] = {343.0, 548.0, 227.0};
    double lp1[3] = {343.0, 548.0, 332.0};
    double lp2[3] = {213.0, 548.0, 227.0};
    double lp3[3] = {lp1[0] + lp2[0] - lc[0], lp1[1] + lp2[1] - lc[1],
                     lp1[2] + lp2[2] - lc[2]};
    unsigned int lightID = yi.getNextFreeID();
    yi.startTriMesh(lightID, 4, 2, false, false, 0);
    {
        double q[4][3];
        memcpy(q[0], lc, 24); memcpy(q[1], lp1, 24);
        memcpy(q[2], lp3, 24); memcpy(q[3], lp2, 24);
        addQuad(yi, lightm, q);
    }
    yi.endTriMesh();
    yi.endGeometry();

    // --- area light (scenes.py:104-108) ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "arealight");
    yi.paramsSetPoint("corner", lc[0], lc[1], lc[2]);
    yi.paramsSetPoint("point1", lp1[0], lp1[1], lp1[2]);
    yi.paramsSetPoint("point2", lp2[0], lp2[1], lp2[2]);
    yi.paramsSetColor("color", 1.f, 1.f, 1.f);
    yi.paramsSetFloat("power", lpower);
    yi.paramsSetInt("samples", lsamples);
    yi.paramsSetInt("object", (int)lightID);
    yi.createLight("arealamp");

    // --- camera (scenes.py:120-122) ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "perspective");
    yi.paramsSetPoint("from", 278, 273, -800);
    yi.paramsSetPoint("to", 278, 273, 0);
    yi.paramsSetPoint("up", 278, 274, -800);
    yi.paramsSetInt("resx", res);
    yi.paramsSetInt("resy", res);
    yi.paramsSetFloat("focal", 1.4);
    yi.createCamera("cam");

    // --- integrators ---
    yi.paramsClearAll();
    yi.paramsSetString("type", integ.c_str());
    yi.paramsSetInt("raydepth", 5);
    if (integ == "pathtracing") {
        yi.paramsSetInt("path_samples", argc > 6 ? atoi(argv[6]) : 8);
        yi.paramsSetInt("bounces", argc > 7 ? atoi(argv[7]) : 3);
        yi.paramsSetBool("no_recursive", false);
        yi.paramsSetString("caustic_type", "path");
    } else if (integ == "photonmapping") {
        // argv[6]=photons argv[7]=bounces argv[9]=fg_samples
        yi.paramsSetInt("photons", argc > 6 ? atoi(argv[6]) : 100000);
        yi.paramsSetInt("cPhotons", argc > 6 ? atoi(argv[6]) : 100000);
        yi.paramsSetInt("bounces", argc > 7 ? atoi(argv[7]) : 4);
        yi.paramsSetFloat("diffuseRadius", 40.0);
        yi.paramsSetFloat("causticRadius", 30.0);
        yi.paramsSetInt("search", 200);
        yi.paramsSetInt("caustic_mix", 100);
        yi.paramsSetBool("finalGather", true);
        yi.paramsSetInt("fg_samples", argc > 9 ? atoi(argv[9]) : 8);
        yi.paramsSetInt("fg_bounces", 1);
    } else if (integ == "SPPM") {
        // argv[6]=photons-per-pass argv[7]=passes
        yi.paramsSetInt("photons", argc > 6 ? atoi(argv[6]) : 100000);
        yi.paramsSetInt("passNums", argc > 7 ? atoi(argv[7]) : 8);
        yi.paramsSetInt("bounces", 4);
        yi.paramsSetFloat("photonRadius", 40.0);
        yi.paramsSetInt("searchNum", 100);
        yi.paramsSetBool("pmIRE", false);
    } else if (integ == "bidirectional") {
        yi.paramsSetBool("do_LightImage", false);
    }
    yi.createIntegrator("surfinteg");
    yi.paramsClearAll();
    yi.paramsSetString("type", "none");
    yi.createIntegrator("volinteg");

    // --- render params (environment.cc:596-705,481-532) ---
    yi.paramsClearAll();
    paraMap_t &rp = *yi.getRenderParameters();
    rp["camera_name"] = std::string("cam");
    rp["integrator_name"] = std::string("surfinteg");
    rp["volintegrator_name"] = std::string("volinteg");
    rp["width"] = res;
    rp["height"] = res;
    rp["AA_passes"] = 1;
    rp["AA_minsamples"] = spp;
    rp["AA_pixelwidth"] = 1.0f;
    rp["filter_type"] = std::string("box");
    rp["gamma"] = 1.0f;
    rp["clamp_rgb"] = false;
    rp["premult"] = false;
    rp["threads"] = -1;

    std::vector<float> fb((size_t)res * res * 4, 0.f);
    memoryIO_t out_mem(res, res, fb.data());

    struct timeval t0, t1;
    gettimeofday(&t0, nullptr);
    yi.render(out_mem);
    gettimeofday(&t1, nullptr);
    double secs =
        (t1.tv_sec - t0.tv_sec) + 1e-6 * (t1.tv_usec - t0.tv_usec);
    double prim = (double)res * res * spp;
    fprintf(stderr,
            "[refgold] %s %dspp %dx%d: %.2fs, %.2f Mprimary-rays/s\n",
            integ.c_str(), spp, res, res, secs, prim / secs / 1e6);
    writeNpy(out, fb.data(), res, res, 4);
    printf("{\"integrator\": \"%s\", \"spp\": %d, \"res\": %d, "
           "\"seconds\": %.3f, \"primary_mrays_per_s\": %.3f}\n",
           integ.c_str(), spp, res, secs, prim / secs / 1e6);
    return 0;
}
