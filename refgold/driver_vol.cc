/* Golden-image driver #3: volume integration (round-4 verdict missing #4:
 * the SingleScatter marcher + UniformVolume + attenuation-grid mode had
 * internal tests only).
 *
 * Scene (mirrored by core_tpu/scenes.py:golden_volume_scene):
 *   - gray ground quad 20x20 at y=0;
 *   - UniformVolume box [-2,2]x[0,4]x[-2,2], sigma_s 0.05 sigma_a 0.01;
 *   - one spotlight from (0,6,0) to (0,0,0), cone 30 deg, power 200
 *     (the classic visible light shaft);
 *   - directlighting surface integrator + SingleScatterIntegrator
 *     (stepSize 0.2); optimize=1 enables the per-light attenuation grid.
 *
 * Usage: refdriver_vol <spp> <res> <out.npy> [optimize 0|1]
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
void registerPlugin_shinydiffuse(renderEnvironment_t &);
void registerPlugin_simplemat(renderEnvironment_t &);
void registerPlugin_arealight(renderEnvironment_t &);
void registerPlugin_cameras(renderEnvironment_t &);
void registerPlugin_spotlight(renderEnvironment_t &);
void registerPlugin_uniformvol(renderEnvironment_t &);
void registerPlugin_singlescatter(renderEnvironment_t &);
void registerPlugin_emptyvol(renderEnvironment_t &);
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
    int spp = argc > 1 ? atoi(argv[1]) : 16;
    int res = argc > 2 ? atoi(argv[2]) : 128;
    const char *out = argc > 3 ? argv[3] : "golden_vol.npy";
    bool optimize = argc > 4 && atoi(argv[4]) != 0;

    goldenIface_t yi;
    renderEnvironment_t *env = yi.getEnv();
    registerPlugin_directlight(*env);
    registerPlugin_shinydiffuse(*env);
    registerPlugin_simplemat(*env);
    registerPlugin_arealight(*env);
    registerPlugin_cameras(*env);
    registerPlugin_spotlight(*env);
    registerPlugin_uniformvol(*env);
    registerPlugin_singlescatter(*env);
    registerPlugin_emptyvol(*env);

    yi.setVerbosityWarning();
    yi.startScene();

    yi.paramsClearAll();
    yi.paramsSetString("type", "shinydiffusemat");
    yi.paramsSetColor("color", 0.6f, 0.6f, 0.6f);
    material_t *gray = yi.createMaterial("gray");

    yi.startGeometry();
    unsigned int gndID = yi.getNextFreeID();
    yi.startTriMesh(gndID, 4, 2, false, false, 0);
    {
        int v0 = yi.addVertex(-10.0, 0.0, -10.0);
        int v1 = yi.addVertex(10.0, 0.0, -10.0);
        int v2 = yi.addVertex(10.0, 0.0, 10.0);
        int v3 = yi.addVertex(-10.0, 0.0, 10.0);
        yi.addTriangle(v0, v1, v2, gray);
        yi.addTriangle(v0, v2, v3, gray);
    }
    yi.endTriMesh();
    yi.endGeometry();

    // volume region
    yi.paramsClearAll();
    yi.paramsSetString("type", "UniformVolume");
    yi.paramsSetFloat("sigma_s", 0.05);
    yi.paramsSetFloat("sigma_a", 0.01);
    yi.paramsSetFloat("l_e", 0.0);
    yi.paramsSetFloat("g", 0.0);
    yi.paramsSetFloat("minX", -2.0);
    yi.paramsSetFloat("minY", 0.0);
    yi.paramsSetFloat("minZ", -2.0);
    yi.paramsSetFloat("maxX", 2.0);
    yi.paramsSetFloat("maxY", 4.0);
    yi.paramsSetFloat("maxZ", 2.0);
    yi.createVolumeRegion("fog");

    // spotlight
    yi.paramsClearAll();
    yi.paramsSetString("type", "spotlight");
    yi.paramsSetPoint("from", 0.0, 6.0, 0.0);
    yi.paramsSetPoint("to", 0.0, 0.0, 0.0);
    yi.paramsSetColor("color", 1.f, 1.f, 1.f);
    yi.paramsSetFloat("power", 200.0);
    yi.paramsSetFloat("cone_angle", 30.0);
    yi.paramsSetFloat("blend", 0.15);
    yi.createLight("spot");

    // camera
    yi.paramsClearAll();
    yi.paramsSetString("type", "perspective");
    yi.paramsSetPoint("from", 5.0, 2.5, -6.0);
    yi.paramsSetPoint("to", 0.0, 1.5, 0.0);
    yi.paramsSetPoint("up", 5.0, 3.5, -6.0);
    yi.paramsSetInt("resx", res);
    yi.paramsSetInt("resy", res);
    yi.paramsSetFloat("focal", 1.2);
    yi.createCamera("cam");

    yi.paramsClearAll();
    yi.paramsSetString("type", "directlighting");
    yi.paramsSetInt("raydepth", 1);
    yi.createIntegrator("surfinteg");
    yi.paramsClearAll();
    yi.paramsSetString("type", "SingleScatterIntegrator");
    yi.paramsSetFloat("stepSize", 0.2);
    yi.paramsSetBool("adaptive", false);
    yi.paramsSetBool("optimize", optimize);
    yi.createIntegrator("volinteg");

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
    double secs = (t1.tv_sec - t0.tv_sec) + 1e-6 * (t1.tv_usec - t0.tv_usec);
    fprintf(stderr, "[refgold_vol] %dspp %dx%d opt=%d: %.2fs\n", spp, res,
            res, (int)optimize, secs);
    writeNpy(out, fb.data(), res, res, 4);
    printf("{\"spp\": %d, \"res\": %d, \"optimize\": %d, \"seconds\": %.3f}\n",
           spp, res, (int)optimize, secs);
    return 0;
}
