// Golden-trajectory dump driver for the reference C++ build.
// Drives the PUBLIC stark API (scene setups mirror examples/main.cpp:41-74
// hanging_cloth and :371-414 spinning_box_cloth at reduced resolution) and
// writes per-step vertex positions as text for the parity test
// (tests/test_trajectory_parity.py). Build via tools/parity/build_ref.sh.
#include <cstddef>
#include <cmath>
#include <cstdio>
#include <string>
#include <stark>

static void dump(FILE* f, stark::PointSetHandler& ps, int n, double t) {
    std::fprintf(f, "step t=%.17g\n", t);
    for (int i = 0; i < n; i++) {
        Eigen::Vector3d x = ps.get_position(i);
        std::fprintf(f, "%.17g %.17g %.17g\n", x.x(), x.y(), x.z());
    }
}

int main(int argc, char** argv) {
    std::string scene = argc > 1 ? argv[1] : "hanging_cloth";
    std::string out_path = argc > 2 ? argv[2] : "/tmp/golden.txt";
    int n_steps = argc > 3 ? std::atoi(argv[3]) : 30;

    stark::Settings settings;
    settings.output.simulation_name = "golden_" + scene;
    settings.output.output_directory = "/tmp/golden_out";
    settings.output.fps = 0;  // no frame writes
    settings.output.console_verbosity = symx::Verbosity::Minimal;
    settings.simulation.max_time_step_size = 1.0 / 30.0;
    settings.simulation.use_adaptive_time_step = false;  // clean step alignment

    if (scene == "hanging_cloth") {
        settings.simulation.init_frictional_contact = false;
        stark::Simulation simulation(settings);
        const int n = 16;
        const double d = 1.0, hd = d / 2.0;
        auto material = stark::Surface::Params::Cotton_Fabric();
        auto [V, T, H] = simulation.presets->deformables->add_surface_grid(
            "cloth", { d, d }, { n, n }, material);
        H.contact.disable_collision(H.contact);
        auto bc_params = stark::EnergyPrescribedPositions::Params().set_stiffness(1e6);
        simulation.deformables->prescribed_positions->add_inside_aabb(
            H.point_set, { hd, hd, 0.0 }, { 0.001, 0.001, 0.001 }, bc_params);
        simulation.deformables->prescribed_positions->add_inside_aabb(
            H.point_set, { -hd, hd, 0.0 }, { 0.001, 0.001, 0.001 }, bc_params);
        FILE* f = std::fopen(out_path.c_str(), "w");
        int np = (n + 1) * (n + 1);
        for (int s = 0; s < n_steps; s++) {
            simulation.run_one_time_step();
            dump(f, H.point_set, np, simulation.get_time());
        }
        std::fclose(f);
    } else if (scene == "spinning_box_cloth") {
        stark::Simulation simulation(settings);
        stark::EnergyFrictionalContact::GlobalParams contact_params;
        contact_params.default_contact_thickness = 0.002;
        simulation.interactions->contact->set_global_params(contact_params);
        const int n = 16;
        auto cloth = simulation.presets->deformables->add_surface_grid(
            "cloth", Eigen::Vector2d(0.4, 0.4), { n, n },
            stark::Surface::Params::Cotton_Fabric());
        auto box = simulation.presets->rigidbodies->add_box("box", 1.0, 0.08);
        box.handler.rigidbody.add_translation({ 0.0, 0.0, -0.08 });
        auto fix = simulation.rigidbodies->add_constraint_fix(box.handler.rigidbody);
        FILE* f = std::fopen(out_path.c_str(), "w");
        FILE* frb = std::fopen((out_path + ".rb").c_str(), "w");
        int np = (n + 1) * (n + 1);
        for (int s = 0; s < n_steps; s++) {
            double t = simulation.get_time();
            fix.set_transformation({ 0.0, 0.0, -0.08 - 0.1 * std::sin(t) },
                                   90.0 * t, { 0.0, 0.0, 1.0 });
            simulation.run_one_time_step();
            dump(f, cloth.handler.point_set, np, simulation.get_time());
            Eigen::Vector3d bt = box.handler.rigidbody.get_translation();
            Eigen::Quaterniond bq = box.handler.rigidbody.get_quaternion();
            std::fprintf(frb, "%.17g %.17g %.17g %.17g %.17g %.17g %.17g\n",
                         bt.x(), bt.y(), bt.z(),
                         bq.w(), bq.x(), bq.y(), bq.z());
        }
        std::fclose(f);
        std::fclose(frb);
    }
    return 0;
}
