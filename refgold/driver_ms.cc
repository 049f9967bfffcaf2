/* Golden-image driver #2: textured mesh + image-based lighting
 * (BASELINE config #3; round-4 verdict missing #2).
 *
 * Scene (mirrored EXACTLY by core_tpu/scenes.py:golden_mesh_scene):
 *   - torus (U=48 x V=24 quads, R=1.2 r=0.5, center (0,1.5,0)), UVs
 *     x-tiled 3x, smoothMesh 80 deg, checker.tga diffuse via a
 *     texture_mapper shader node with texco=uv;
 *   - ground quad 24x24 at y=0, UVs 0..6 (repeat), same texture;
 *   - textureback background from sky.tga (spherical mapping) with
 *     ibl=true -> auto-created bglight (bglight.cc 2-D luminance CDF
 *     importance sampling) as the only light.
 *
 * The textures are 8-bit TGAs (refgold/make_assets.py) so both
 * renderers decode identical values through their own codecs.
 *
 * Usage: refdriver_ms <integrator> <spp> <res> <out.npy> [ibl_samples]
 *                     [path_samples] [bounces]
 */
#include <interface/yafrayinterface.h>
#include <core_api/environment.h>
#include <core_api/material.h>
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
void registerPlugin_emptyvol(renderEnvironment_t &);
void registerPlugin_shinydiffuse(renderEnvironment_t &);
void registerPlugin_simplemat(renderEnvironment_t &);
void registerPlugin_arealight(renderEnvironment_t &);
void registerPlugin_cameras(renderEnvironment_t &);
void registerPlugin_textures(renderEnvironment_t &);
void registerPlugin_nodes(renderEnvironment_t &);
void registerPlugin_tga(renderEnvironment_t &);
void registerPlugin_textureback(renderEnvironment_t &);
void registerPlugin_bglight(renderEnvironment_t &);
}

class goldenIface_t : public yafrayInterface_t {
public:
    renderEnvironment_t *getEnv() { return env; }
};

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
    int spp = argc > 2 ? atoi(argv[2]) : 16;
    int res = argc > 3 ? atoi(argv[3]) : 128;
    const char *out = argc > 4 ? argv[4] : "golden_ms.npy";
    int ibl_samples = argc > 5 ? atoi(argv[5]) : 8;

    goldenIface_t yi;
    renderEnvironment_t *env = yi.getEnv();
    registerPlugin_directlight(*env);
    registerPlugin_pathtracer(*env);
    registerPlugin_emptyvol(*env);
    registerPlugin_shinydiffuse(*env);
    registerPlugin_simplemat(*env);
    registerPlugin_arealight(*env);
    registerPlugin_cameras(*env);
    registerPlugin_textures(*env);
    registerPlugin_nodes(*env);
    registerPlugin_tga(*env);
    registerPlugin_textureback(*env);
    registerPlugin_bglight(*env);

    yi.setVerbosityWarning();
    yi.startScene();

    // --- textures ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "image");
    yi.paramsSetString("filename", "assets/checker.tga");
    yi.paramsSetFloat("gamma", 1.0);
    yi.paramsSetString("interpolate", "bilinear");
    yi.createTexture("checktex");
    yi.paramsClearAll();
    yi.paramsSetString("type", "image");
    yi.paramsSetString("filename", "assets/sky.tga");
    yi.paramsSetFloat("gamma", 1.0);
    yi.paramsSetString("interpolate", "bilinear");
    yi.createTexture("skytex");

    // --- materials (UV-mapped checker diffuse) ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 1.f, 1.f, 1.f);
    yi.paramsSetFloat("diffuse_reflect", 0.9);
    yi.paramsSetString("diffuse_shader", "map_ball");
    yi.paramsStartList();
    yi.paramsPushList();
    yi.paramsSetString("element", "shader_node");
    yi.paramsSetString("name", "map_ball");
    yi.paramsSetString("type", "texture_mapper");
    yi.paramsSetString("texture", "checktex");
    yi.paramsSetString("texco", "uv");
    yi.paramsEndList();
    material_t *ball = yi.createMaterial("ball");

    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 1.f, 1.f, 1.f);
    yi.paramsSetFloat("diffuse_reflect", 0.8);
    yi.paramsSetString("diffuse_shader", "map_gnd");
    yi.paramsStartList();
    yi.paramsPushList();
    yi.paramsSetString("element", "shader_node");
    yi.paramsSetString("name", "map_gnd");
    yi.paramsSetString("type", "texture_mapper");
    yi.paramsSetString("texture", "checktex");
    yi.paramsSetString("texco", "uv");
    yi.paramsEndList();
    material_t *gnd = yi.createMaterial("ground");

    // --- geometry ---
    const int U = 48, V = 24;
    const double R = 1.2, r = 0.5, cy = 1.5;
    yi.startGeometry();
    unsigned int torusID = yi.getNextFreeID();
    yi.startTriMesh(torusID, (U + 1) * (V + 1), 2 * U * V, false, true, 0);
    {
        std::vector<int> vid((U + 1) * (V + 1)), uvid((U + 1) * (V + 1));
        for (int i = 0; i <= U; ++i) {
            double u = 2.0 * M_PI * i / U;
            for (int j = 0; j <= V; ++j) {
                double v = 2.0 * M_PI * j / V;
                double x = (R + r * std::cos(v)) * std::cos(u);
                double z = (R + r * std::cos(v)) * std::sin(u);
                double y = cy + r * std::sin(v);
                int k = i * (V + 1) + j;
                vid[k] = yi.addVertex(x, y, z);
                uvid[k] = yi.addUV((float)(3.0 * i / U), (float)((double)j / V));
            }
        }
        for (int i = 0; i < U; ++i)
            for (int j = 0; j < V; ++j) {
                int a = i * (V + 1) + j, b = (i + 1) * (V + 1) + j;
                int c = (i + 1) * (V + 1) + j + 1, d = i * (V + 1) + j + 1;
                yi.addTriangle(vid[a], vid[b], vid[c],
                               uvid[a], uvid[b], uvid[c], ball);
                yi.addTriangle(vid[a], vid[c], vid[d],
                               uvid[a], uvid[c], uvid[d], ball);
            }
    }
    yi.endTriMesh();
    yi.smoothMesh(torusID, 80.0);

    unsigned int gndID = yi.getNextFreeID();
    yi.startTriMesh(gndID, 4, 2, false, true, 0);
    {
        double E = 12.0, T = 6.0;
        int v0 = yi.addVertex(-E, 0.0, -E);
        int v1 = yi.addVertex(E, 0.0, -E);
        int v2 = yi.addVertex(E, 0.0, E);
        int v3 = yi.addVertex(-E, 0.0, E);
        int u0 = yi.addUV(0.f, 0.f);
        int u1 = yi.addUV((float)T, 0.f);
        int u2 = yi.addUV((float)T, (float)T);
        int u3 = yi.addUV(0.f, (float)T);
        yi.addTriangle(v0, v1, v2, u0, u1, u2, gnd);
        yi.addTriangle(v0, v2, v3, u0, u2, u3, gnd);
    }
    yi.endTriMesh();
    yi.endGeometry();

    // --- background: textureback + auto bglight (IBL) ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "textureback");
    yi.paramsSetString("ibl_texture", "skytex");
    yi.paramsSetBool("ibl", true);
    yi.paramsSetInt("ibl_samples", ibl_samples);
    yi.paramsSetFloat("power", 1.0);
    yi.createBackground("world");

    // --- camera ---
    yi.paramsClearAll();
    yi.paramsSetString("type", "perspective");
    yi.paramsSetPoint("from", 6.0, 3.2, -7.5);
    yi.paramsSetPoint("to", 0.0, 1.8, 0.0);
    yi.paramsSetPoint("up", 6.0, 4.2, -7.5);
    yi.paramsSetInt("resx", res);
    yi.paramsSetInt("resy", res);
    yi.paramsSetFloat("focal", 1.1);
    yi.createCamera("cam");

    // --- integrators ---
    yi.paramsClearAll();
    yi.paramsSetString("type", integ.c_str());
    yi.paramsSetInt("raydepth", 3);
    if (integ == "pathtracing") {
        yi.paramsSetInt("path_samples", argc > 6 ? atoi(argv[6]) : 4);
        yi.paramsSetInt("bounces", argc > 7 ? atoi(argv[7]) : 2);
        yi.paramsSetBool("no_recursive", false);
        yi.paramsSetString("caustic_type", "path");
    }
    yi.createIntegrator("surfinteg");
    yi.paramsClearAll();
    yi.paramsSetString("type", "none");
    yi.createIntegrator("volinteg");

    // --- render params ---
    yi.paramsClearAll();
    paraMap_t &rp = *yi.getRenderParameters();
    rp["camera_name"] = std::string("cam");
    rp["integrator_name"] = std::string("surfinteg");
    rp["volintegrator_name"] = std::string("volinteg");
    rp["background_name"] = std::string("world");
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
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-6 * (t1.tv_usec - t0.tv_usec);
    fprintf(stderr, "[refgold_ms] %s %dspp %dx%d: %.2fs\n", integ.c_str(),
            spp, res, res, secs);
    writeNpy(out, fb.data(), res, res, 4);
    printf("{\"integrator\": \"%s\", \"spp\": %d, \"res\": %d, "
           "\"seconds\": %.3f}\n", integ.c_str(), spp, res, secs);
    return 0;
}
